"""Source readers.

Reference analogues: S1 JSON CDC file reader
(``orchestrator/cdc_cdf_orchestrator.py:118,137``), S2 extension-dispatched
parquet/json reference-data reader (``orchestrator/cdc_cdf_orchestrator.py:152-157``).
We standardize on Parquet (the mandated input shape) but keep JSON for small
fixtures. Always prune columns at the read."""

from __future__ import annotations

import os


def read_events(paths: list[str] | str, columns: list[str] | None = None):
    """Change-event Parquet reader (column-pruned)."""
    import ray.data as rd

    return rd.read_parquet(paths, columns=columns)


def read_reference_data(path: str):
    """Extension-dispatched reader for small reference/dimension data."""
    import ray.data as rd

    ext = os.path.splitext(path)[1].lower()
    if ext in (".json", ".jsonl", ".ndjson"):
        return rd.read_json(path)
    if ext in (".parquet", ""):
        return rd.read_parquet(path)
    if ext == ".csv":
        return rd.read_csv(path)
    raise ValueError(f"unsupported reference data format: {ext}")
