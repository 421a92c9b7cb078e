"""maritime_activity_reports_cdc_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the *capabilities* of the reference repo
``Riaz123/maritime-activity-reports-cdc`` (a PySpark + Delta-CDF medallion pipeline,
see /root/repo/SURVEY.md) as a generic, Ray-Data-first change-data-capture engine:

- **Bronze**: append-only change-log ingest with CDC metadata stamping, validation
  and tiered quality scoring (reference: ``bronze/cdc_ingestion.py:43-69``,
  ``utils/data_quality.py:20-99``).
- **Silver**: keyed incremental upsert with last-writer-wins + SCD2 history,
  driven by replaying the change feed in checkpoint epochs; hash-partitioned
  shuffle + stateful merge appliers (reference: ``silver/cdf_processor.py:255-332``,
  ``bronze/cdc_ingestion.py:176-224``).
- **Gold**: incremental per-group aggregate refresh scoped to affected keys
  (reference: ``gold/cdf_processor.py:229-427``).
- **Exactly-once**: idempotent two-phase-commit Parquet sink — staged fragments +
  atomic manifest swap keyed by epoch — with per-partition lineage records
  (reference analogue: Delta transactional commit + stream checkpoints,
  ``silver/cdf_processor.py:83-88``).

Everything is expressed over ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, hash repartitioning for the merge exchange, actor pools
for stateful stages. No module in this package calls ``ray.init`` — sessions are
owned by the CLI / bench / test harness.
"""

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.state.table import ConcurrentCommitError

__version__ = "0.1.0"


def collect_table(ds):
    """Driver-collect a (small-result) Dataset as ONE pyarrow Table.

    Use instead of ``Dataset.to_pandas()`` when the schema may carry nested
    (list/struct) evolved columns: Ray's pandas collect TensorArray-casts
    ragged nested columns and fails, while Arrow concatenation is exact.
    Pandas-block datasets convert per block. Same driver-size contract as
    ``to_pandas`` — bounded results only."""
    import pyarrow as pa

    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:  # empty result: no ragged data, the pandas path is safe
        return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return pa.concat_tables(batches, promote_options="default")


def collect_pandas(ds):
    """``collect_table`` then ``pa.Table.to_pandas`` (nested columns become
    plain Python lists/dicts instead of failing the TensorArray cast)."""
    return collect_table(ds).to_pandas()


__all__ = ["ConcurrentCommitError", "EngineConfig", "collect_pandas",
           "collect_table", "__version__"]
