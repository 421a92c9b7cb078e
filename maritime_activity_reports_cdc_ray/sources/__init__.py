from maritime_activity_reports_cdc_ray.sources.readers import read_events, read_reference_data

__all__ = ["read_events", "read_reference_data"]
