"""Resumable partitioned-parquet sink.

The brief's output contract for 100 TB jobs: one directory per partition key
so a failed run skips finished partitions instead of rewriting everything
(reference analogue: partitioned Delta writes + job restarts,
``bronze/cdc_ingestion.py:121-127``). ``write_partitioned``:

- routes rows to ``root/<by>=<value>/`` directories inside ``map_batches``
  tasks (per-batch group split — no global shuffle; a batch appends one file
  per key it contains, names derived from content so retried tasks overwrite
  their own output instead of duplicating),
- marks a partition complete with a ``_SUCCESS`` sentinel only after the full
  dataset execution drains,
- on rerun, SKIPS partitions whose sentinel exists — the skip happens at the
  batch level (rows of finished partitions are dropped before any write), so
  a resumed job only pays for the missing partitions.

Writes stream through the executor (the driver only collects one tiny row per
written file); partition-count scales to thousands of keys, not millions —
the same regime hive-partitioned output targets everywhere.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

_META = pa.schema([("partition", pa.string()), ("path", pa.string()),
                   ("rows", pa.int64())])

# per-worker (task id, content-hash) → ordinal, for collision-free yet
# retry-stable fragment names (see the naming note in ``write``)
_TASK_SEQ: dict = {}


def _partdir(root: str, by: str, value) -> str:
    return os.path.join(root, f"{by}={value}")


def write_partitioned(ds, root: str, by: str, compression: str = "zstd") -> dict:
    """Write ``ds`` under ``root/<by>=<value>/``, resumably. Returns
    ``{"partitions_written": n, "partitions_skipped": k, "rows": r}``."""
    import pyarrow.compute as pc

    import shutil

    os.makedirs(root, exist_ok=True)
    done = set()
    for d in os.listdir(root):
        if "=" not in d:
            continue
        if os.path.exists(os.path.join(root, d, "_SUCCESS")):
            done.add(d.split("=", 1)[1])
        else:
            # partition from a crashed run (no sentinel): clear it BEFORE the
            # execution, or its rewrite would coexist with the old files
            # (batch-content file names only collide on identical splits)
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pylist([], schema=_META)
        keys = batch.column(by).cast(pa.string())
        rows = []
        for v in pc.unique(keys).to_pylist():
            if v in done:
                continue
            part = batch.filter(pc.equal(keys, v))
            d = _partdir(root, by, v)
            os.makedirs(d, exist_ok=True)
            # name = content hash + a task-scoped ordinal per hash: the hash
            # keeps a RETRIED task rewriting the same paths (no duplicates),
            # while the ordinal keeps two byte-identical batches within one
            # run from silently overwriting each other (same-hash batches in
            # different tasks are disambiguated by the task id; within one
            # task by the per-(task, hash) counter)
            import hashlib

            import ray

            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, part.schema) as w:
                w.write_table(part)
            content = hashlib.md5(sink.getvalue().to_pybytes()).hexdigest()[:12]
            try:
                task = ray.get_runtime_context().get_task_id() or "driver"
            except Exception:
                task = "driver"
            if _TASK_SEQ.get("task") != task:  # new task in this worker → reset
                _TASK_SEQ.clear()
                _TASK_SEQ["task"] = task
            seq = _TASK_SEQ.get(content, 0)
            _TASK_SEQ[content] = seq + 1
            tag = f"{content}-{task[:8]}-{seq:03d}"
            dst = os.path.join(d, f"part-{tag}-{part.num_rows}.parquet")
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            os.close(fd)
            try:
                pq.write_table(part, tmp, compression=compression)
                os.replace(tmp, dst)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            rows.append({"partition": v, "path": dst, "rows": part.num_rows})
        return pa.Table.from_pylist(rows, schema=_META)

    meta = ds.map_batches(write, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    # a retried task re-reports its (identical) files: dedupe by path so the
    # row count reflects what is on disk, not how many attempts ran
    by_path = {r["path"]: r for r in meta}
    written = sorted({r["partition"] for r in by_path.values()})
    for v in written:  # sentinel only after the whole execution drained
        open(os.path.join(_partdir(root, by, v), "_SUCCESS"), "w").write("ok")
    return {"partitions_written": len(written),
            "partitions_skipped": len(done),
            "rows": int(sum(r["rows"] for r in by_path.values()))}
