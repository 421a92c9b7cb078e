from maritime_activity_reports_cdc_ray.stages.merge_spec import (MergeBranch, MergeSpec,
                                                         SpecTable, merge_into)
from maritime_activity_reports_cdc_ray.stages.partition import make_partitioner
from maritime_activity_reports_cdc_ray.stages.stamp import make_stamper
from maritime_activity_reports_cdc_ray.stages.validate import make_validator

__all__ = ["MergeBranch", "MergeSpec", "SpecTable", "make_partitioner",
           "make_stamper", "make_validator", "merge_into"]
