from maritime_activity_reports_cdc_ray.pipelines.curation import curate_documents
from maritime_activity_reports_cdc_ray.pipelines.gold_consumer import GoldConsumer
from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

__all__ = ["CDCReplay", "GoldConsumer", "curate_documents"]
