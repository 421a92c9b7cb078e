from maritime_activity_reports_cdc_ray.stages.partition import make_partitioner
from maritime_activity_reports_cdc_ray.stages.stamp import make_stamper
from maritime_activity_reports_cdc_ray.stages.validate import make_validator

__all__ = ["make_partitioner", "make_stamper", "make_validator"]
