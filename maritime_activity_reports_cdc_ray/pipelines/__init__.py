from maritime_activity_reports_cdc_ray.pipelines.curation import curate_documents
from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

__all__ = ["CDCReplay", "curate_documents"]
