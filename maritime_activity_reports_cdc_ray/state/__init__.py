from maritime_activity_reports_cdc_ray.state.table import Fragment, LakeTable, Manifest

__all__ = ["Fragment", "LakeTable", "Manifest"]
