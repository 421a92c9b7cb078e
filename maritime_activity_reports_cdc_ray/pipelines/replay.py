"""The epoch replay driver: bronze → silver → gold with checkpoint/resume.

This is the Ray-Data translation of the reference's streaming topology
(SURVEY.md §3.3): Delta-CDF micro-batches become **checkpoint epochs** (one
input Parquet file group = one epoch = one micro-batch), ``foreachBatch`` MERGE
handlers become the hash-shuffled merge-applier actor pool, stream checkpoints
become the manifest epoch watermark, and the orchestrator's restart loop
(``silver/streaming_processor.py:254-277``) becomes plain idempotent re-run —
every epoch's effects are committed via the two-phase manifest swap, so a crash
anywhere leaves a state from which ``run()`` simply continues.

Per epoch:

1. **bronze ingest** (reference ``bronze/cdc_ingestion.py:27-69``):
   ``read_parquet → map_batches(stamp) → map_batches(validate) →
   map_batches(partition) → write fragments → commit``.
2. **silver merge** (reference ``silver/cdf_processor.py:44-81``): read the
   epoch's bronze fragments → assign ``gid`` → ``repartition(keys=["gid"])``
   (hash shuffle) → ``map_batches(MergeApplier, …, concurrency=N)`` → collect
   lineage (one small row per merge group) → commit.
3. **gold refresh** (reference ``gold/cdf_processor.py:229-427``): changed
   repos from lineage → per-affected-pid partition-local rollup → commit.

Salt adaptation: after each silver commit, per-pid event counts from lineage
drive the desired salt map; a self-healing resalt pass at the next epoch start
re-slices any pid whose fragment layout disagrees with the desired map (so a
crash between commit and resalt is harmless).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.schemas import EVENT_SCHEMA, SILVER_CURRENT_SCHEMA
from maritime_activity_reports_cdc_ray.stages.gold import GOLD_RESULT_SCHEMA
from maritime_activity_reports_cdc_ray.stages.merge import (
    MergeApplier,
    silver_schema_for,
)
from maritime_activity_reports_cdc_ray.stages.partition import make_gid_assigner, make_partitioner
from maritime_activity_reports_cdc_ray.stages.stamp import make_stamper
from maritime_activity_reports_cdc_ray.stages.validate import make_validator
from maritime_activity_reports_cdc_ray.state.table import Fragment, LakeTable, union_schemas
from maritime_activity_reports_cdc_ray.schemas import GOLD_SCHEMA


import contextlib
import threading

# Serializes DataContext mutation windows against concurrent dataset CREATION
# (the bronze-prefetch thread). Ray seals a copy of the global DataContext
# into each Dataset's plan at creation time and the executor reads ONLY the
# sealed copy, so the lock needs to cover creation, never execution — both
# critical sections are milliseconds and the prefetch overlap is preserved.
_CTX_LOCK = threading.Lock()


@contextlib.contextmanager
def hash_shuffle_ctx():
    """Scope the hash-shuffle strategy to one pipeline's dataset CREATION.

    ``repartition(keys=...)`` needs ``ShuffleStrategy.HASH_SHUFFLE`` (Ray >=
    2.46), but the strategy is process-global on DataContext and leaking it
    into unrelated pipelines changes their physical plan (and its aggregator
    actors can starve small clusters). A Dataset seals a context copy at
    creation, so: take the lock, set the strategy, build the plan inside the
    scope, restore + release — then execute OUTSIDE the scope (the sealed
    copy keeps hash shuffle through execution; verified on Ray 2.49). The
    lock keeps a concurrently-creating dataset (bronze prefetch thread) from
    sealing the temporarily-mutated context."""
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    with _CTX_LOCK:
        ctx = rd.DataContext.get_current()
        prev_strategy = ctx.shuffle_strategy
        prev_aggs = getattr(ctx, "max_hash_shuffle_aggregators", None)
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            # aggregators + merge actors (ncpu//2) + read tasks share the
            # cluster; cpus//4 aggregators keeps ≥ cpus//4 slots free for
            # reads so a small cluster can't deadlock on a fully-reserved pool
            ctx.max_hash_shuffle_aggregators = max(2, cpus // 4)
        except Exception:
            pass
        try:
            yield
        finally:
            ctx.shuffle_strategy = prev_strategy
            if prev_aggs is not None:
                ctx.max_hash_shuffle_aggregators = prev_aggs


def ensure_hash_shuffle() -> None:  # kept for scripts that opt in globally
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    rd.DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def _cluster_cpus() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return 8


def _make_bronze_writer(outdir: str, compression: str):
    """Pass-through map_batches stage that persists each block as a bronze
    fragment (fused epoch pipeline). Fragment names derive from block content
    (min sequence number + row count) so a retried task overwrites its own
    output instead of duplicating it; the driver clears the epoch dir before
    the execution, so leftovers from a crashed attempt cannot leak in."""
    import tempfile

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        seqmin = int(_pc.min(batch.column("cdc_sequence_number")).as_py())
        dst = os.path.join(outdir, f"data-{seqmin:020d}-{batch.num_rows}.parquet")
        fd, tmp = tempfile.mkstemp(dir=outdir, suffix=".tmp")
        os.close(fd)
        try:
            _pq.write_table(batch, tmp, compression=compression)
            os.replace(tmp, dst)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return batch

    return write


_BUCKET_META_SCHEMA = pa.schema([("path", pa.string()), ("bucket", pa.int64()),
                                 ("rows", pa.int64())])


def _make_bucketed_bronze_writer(outdir: str, compression: str, nbuckets: int,
                                 salt_arr, max_salt: int):
    """Map-side shuffle writer for the ``bronze_bucket`` exchange: the
    mandatory bronze persist doubles as the all-to-all.

    Each task splits its block by ``bucket = scramble(gid) % nbuckets`` (gid
    computed transiently from pid/path_hash + the epoch's salt array — NOT
    persisted, so the files are ordinary bronze fragments and the unfused
    resume path reads them unchanged) and writes one fragment per non-empty
    bucket. A merge task then reads exactly its bucket's files — complete gid
    groups by construction — with no object-store exchange, no aggregator
    actors, and no sort barrier: the only inter-phase hop is the filesystem
    (page cache on one box; the classic external-shuffle layout on a real
    cluster, where bronze lives on shared storage every node can read).

    File names derive from block content (min sequence number + row count +
    bucket), so a retried task overwrites its own output; the driver clears
    the epoch dir before the execution. Returns one metadata row per file."""
    import tempfile

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    salt_by_pid = np.asarray(salt_arr, dtype=np.uint64)

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return align_empty(_BUCKET_META_SCHEMA)
        pid = batch.column("pid").to_numpy(zero_copy_only=False).astype(np.int64)
        ph = batch.column("path_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        gid = (pid * max_salt + (ph % salt_by_pid[pid]).astype(np.int64)).astype(np.uint64)
        # NB: take the HIGH bits of the multiplicative scramble. gid =
        # pid*max_salt+salt, so with a power-of-two bucket count a low-bits
        # modulus degenerates to f(salt) alone and every pid collapses into
        # ~default_salt buckets (observed: 16 skewed merge tasks on 32 cores)
        mixed = (gid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        bucket = (mixed % np.uint64(nbuckets)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        sb = batch.take(pa.array(order, pa.int64()))
        bs = bucket[order]
        bounds = np.flatnonzero(np.diff(bs, prepend=bs[0] - 1))
        bounds = np.append(bounds, len(bs))
        seqmin = int(_pc.min(batch.column("cdc_sequence_number")).as_py())
        rows = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            b = int(bs[lo])
            dst = os.path.join(
                outdir, f"data-{seqmin:020d}-{batch.num_rows}-b{b:05d}.parquet")
            fd, tmp = tempfile.mkstemp(dir=outdir, suffix=".tmp")
            os.close(fd)
            try:
                _pq.write_table(sb.slice(lo, hi - lo), tmp, compression=compression)
                os.replace(tmp, dst)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            rows.append({"path": dst, "bucket": b, "rows": hi - lo})
        return pa.Table.from_pylist(rows, schema=_BUCKET_META_SCHEMA)

    return write


def _feed_schema(with_event_time: bool,
                 extras: list | None = None) -> pa.Schema:
    """Schema of a DML feed part file — the stream's event shape, plus an
    explicit ``event_time`` on watermark-enabled lakes (the stamper lets a
    source-supplied event_time win, see stages/stamp.py), plus any evolved
    payload columns an UPDATE feed carries forward."""
    fields = [pa.field("repo", pa.string()), pa.field("path", pa.string()),
              pa.field("commit", pa.string()), pa.field("lang", pa.string()),
              pa.field("content", pa.large_string())]
    fields += list(extras or [])
    if with_event_time:
        fields.append(pa.field("event_time", pa.int64()))
    return pa.schema(fields)


def _bump_commits(commit) -> pa.Array:
    """Bump each zero-padded commit to a LEXICOGRAPHICALLY strictly-greater
    commit, preserving each row's own digit width (LWW compares commits as
    strings per key, so 'c0042' must bump to 'c0043', never re-pad to
    another key's width). Carry overflow ('c999' + 1 = 1000 — one digit
    wider, which would sort BELOW 'c999' and silently lose LWW) falls back
    to appending '0' to the ORIGINAL digits: a prefix extension is strictly
    greater under string order and stays format-valid. Vectorized per
    distinct width — real streams have one."""
    ser = commit.to_pandas().astype(str)
    digits0 = ser.str.slice(1)
    num = digits0.astype("int64") + 1
    digits = num.astype(str)
    widths = ser.str.len() - 1
    out = digits.copy()
    for wv in widths.unique():
        m = widths == wv
        out[m] = digits[m].str.zfill(int(wv))
    overflow = out.str.len() > widths  # zfill never truncates a carry
    if overflow.any():
        out[overflow] = digits0[overflow] + "0"
    return pa.array(("c" + out).tolist(), pa.string())


def _feed_kernel(set_cols: dict | None, event_time: int | None,
                 extras: list | None = None):
    """Per-batch DML-feed builder: bump the winning commit, override the SET
    columns (``set_cols=None`` = tombstone feed), carry the rest forward —
    including evolved payload columns (``extras``: pa.Fields), which the
    winning feed event must re-ship or the LWW merge would null them.
    Runs inside ``map_batches`` — content bytes never touch the driver."""
    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict = {
            "repo": t.column("repo").cast(pa.string()),
            "path": t.column("path").cast(pa.string()),
            "commit": _bump_commits(t.column("commit")),
        }
        if set_cols is None:
            cols["lang"] = pa.array([""] * n, pa.string())
            cols["content"] = pa.array([TOMBSTONE] * n, pa.large_string())
        else:
            cols["lang"] = (pa.array([set_cols["lang"]] * n, pa.string())
                            if "lang" in set_cols
                            else t.column("lang").cast(pa.string()))
            cols["content"] = (
                pa.array([set_cols["content"]] * n, pa.large_string())
                if "content" in set_cols
                else t.column("content").cast(pa.large_string()))
        for f in (extras or []):
            if set_cols is not None and f.name in set_cols:
                cols[f.name] = pa.array([set_cols[f.name]] * n, f.type)
            else:
                c = t.column(f.name)
                cols[f.name] = c.cast(f.type) if c.type != f.type else c
        if event_time is not None:
            cols["event_time"] = pa.array(np.full(n, event_time, np.int64))
        return pa.table(cols)

    return kernel


def align_empty(schema: pa.Schema) -> pa.Table:
    return pa.Table.from_pylist([], schema=schema)


def _drop_content(t: pa.Table) -> pa.Table:
    return t.drop_columns(["content"]) if "content" in t.column_names else t


def _map_nblocks(ncpu: int, est_bytes: int, est_rows: int, n_groups: int) -> int:
    """Block sizing for the fused map phase — the ONE source of truth (see the
    rationale comment in _silver_merge): ~32 MB compressed per block, floored
    so the pool doesn't idle, capped at 4 blocks per CPU."""
    return int(max(4, min(4 * ncpu,
                          max(est_bytes // (32 << 20) + 1,
                              min(2 * ncpu, n_groups, est_rows // 2_000)))))


def _make_bucket_merge_fn(num_partitions: int, salt_arr, merge_args):
    """Merge-task fn for the ``bronze_bucket`` exchange: each item is one
    bucket (a list of fragment paths holding complete gid groups). Reads the
    bucket, recomputes gid (same salt array as the writer), and runs the
    shared ``process_gid_groups`` kernel."""
    from maritime_activity_reports_cdc_ray.stages.merge import make_merge_task_fn

    (table_root, frag_map_ref, epoch, schema_ser, max_salt,
     compression, detect_changes) = merge_args
    merge = make_merge_task_fn(table_root, frag_map_ref, epoch, schema_ser,
                               max_salt, compression, detect_changes)
    assign = make_gid_assigner(num_partitions, salt_arr, max_salt)

    def fn(items: pa.Table) -> pa.Table:
        from maritime_activity_reports_cdc_ray.stages.merge import MERGE_RESULT_SCHEMA

        def read_meta(p: str) -> pa.Table:
            # the merge never needs payload bytes (silver stores a bronze
            # pointer, not content) — prune the content column at the read
            # (~80% of bronze bytes, measured on the generated stream)
            names = [n for n in pq.read_schema(p).names if n != "content"]
            return pq.read_table(p, columns=names)

        outs = []
        for item in items.to_pylist():
            t = pa.concat_tables([read_meta(p) for p in item["paths"]],
                                 promote_options="permissive")
            if t.num_rows:
                outs.append(merge(assign(t)))
        if not outs:
            return align_empty(MERGE_RESULT_SCHEMA)
        return pa.concat_tables(outs)

    return fn


def _make_broadcast_merge_fn(nbuckets: int, merge_args, block_refs):
    """Merge-task fn for the ``broadcast_task`` exchange (small epochs): every
    task fetches ALL of the epoch's mapped blocks (zero-copy from the local
    object store on the node that produced them; one replication per remote
    node — bounded by ``broadcast_exchange_max_bytes``), filters the rows of
    its bucket, and runs the shared merge kernel. No sort, no shuffle, no
    aggregator actors — the entire exchange is ``ray.get`` of a few small
    blocks, which removes the ~1 s/epoch sort barrier a micro-batch stream
    pays under sort_task (measured: 60k-row epoch, 32 CPUs).

    ``block_refs`` are closure-captured ObjectRefs (ref-counted in the task
    spec, exactly like a ``ray.put`` broadcast). Bucketing uses the same
    high-bits multiplicative scramble as the bucketed bronze writer so every
    gid group lands wholly in one bucket."""
    from maritime_activity_reports_cdc_ray.stages.merge import make_merge_task_fn

    merge = make_merge_task_fn(*merge_args)

    def fn(items: pa.Table) -> pa.Table:
        import ray

        from maritime_activity_reports_cdc_ray.stages.merge import MERGE_RESULT_SCHEMA

        tabs = [t for t in ray.get(list(block_refs)) if t.num_rows]
        if not tabs:
            return align_empty(MERGE_RESULT_SCHEMA)
        t = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs, promote_options="permissive")
        gid = t.column("gid").to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (gid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        bucket = (mixed % np.uint64(nbuckets)).astype(np.int64)
        outs = []
        for item in items.to_pylist():
            b = int(item["bucket"])
            sel = t.filter(pa.array(bucket == b))
            if sel.num_rows:
                outs.append(merge(sel))
        if not outs:
            return align_empty(MERGE_RESULT_SCHEMA)
        return pa.concat_tables(outs)

    return fn


def _make_resalt_task_fn(root: str, compression: str):
    """Task fn for distributed re-salting: read one pid's current fragments,
    re-slice by path_hash % want, stage the new per-salt fragments. Same
    shape as maintenance.make_compact_task_fn — partition-local, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        lake = LakeTable(root)
        rows = []
        for item in batch.to_pylist():
            pid, want, epoch = int(item["pid"]), int(item["want"]), int(item["epoch"])
            tabs = [pq.read_table(lake.abspath(p)) for p in item["paths"]]
            t = pa.concat_tables(tabs, promote_options="permissive")
            ph = t.column("path_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
            slot = (ph % np.uint64(want)).astype(np.int64)
            frags = []
            for s in range(want):
                part = t.filter(pa.array(slot == s))
                frags.append(lake.stage_fragment(
                    part, epoch, pid, s, "current", compression, suffix="rs"))
            rows.append({"fragments_json": json.dumps([f.__dict__ for f in frags]),
                         "replaced_json": json.dumps(list(item["paths"]))})
        if not rows:
            return pa.table({"fragments_json": pa.array([], pa.string()),
                             "replaced_json": pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)

    return fn


class CDCReplay:
    def __init__(self, root: str, cfg: EngineConfig | None = None):
        self.root = root
        self.cfg = cfg or EngineConfig()
        self.bronze = LakeTable(os.path.join(root, "bronze"))
        self.silver = LakeTable(os.path.join(root, "silver"))
        self.gold = LakeTable(os.path.join(root, "gold"))
        self._gold_thread: threading.Thread | None = None
        self._gold_exc: list = []
        # in-flight map-phase prefetch of the NEXT epoch (premap): see
        # _spawn_premap. {"epoch", "thread", "result"}.
        self._premap: dict | None = None
        self._premap_count = 0  # epochs whose map phase ran overlapped
        # serializes silver manifest commits: with premap/resalt/presalt on
        # background threads, two read-version -> write-version+1 -> rename
        # sequences may interleave and the later rename silently drops the
        # earlier commit's fragments. Commit fns re-read the manifest inside
        # the lock, so holding it only around the commit call is sufficient.
        self._silver_commit_lock = threading.Lock()

    # ------------------------------------------------------------------ setup
    def setup(self) -> None:
        from maritime_activity_reports_cdc_ray.schemas import BRONZE_SCHEMA, SILVER_CURRENT_SCHEMA

        LakeTable.create(self.bronze.root, "bronze_events", BRONZE_SCHEMA, self.cfg.num_partitions)
        LakeTable.create(self.silver.root, "silver_current", SILVER_CURRENT_SCHEMA, self.cfg.num_partitions)
        LakeTable.create(self.gold.root, "gold_repo_summary", GOLD_SCHEMA, self.cfg.num_partitions)
        if self.cfg.lookup_cache_keys:
            from maritime_activity_reports_cdc_ray.state.cache import LookupCache

            keys = list(self.cfg.lookup_cache_keys)
            LookupCache.create(
                os.path.join(self.root, "cache"), keys,
                pa.schema([BRONZE_SCHEMA.field(k) for k in keys]),
                num_partitions=8)

    # ------------------------------------------------------------------- run
    @staticmethod
    def discover_epochs(input_path: str, files_per_epoch: int = 1) -> list[list[str]]:
        """One epoch = ``files_per_epoch`` consecutive input files (sorted) —
        the generic analogue of the CDF ``startingVersion`` offset ranges.

        A subdirectory named ``*.feed`` is a MULTI-FILE FEED EPOCH (the
        streamed output of :meth:`make_tombstones` / :meth:`make_updates`):
        all its parquet files form ONE epoch, positioned among its siblings
        by name — so one DML statement surfaces as one CDF commit, like a
        Delta ``DELETE FROM``. A feed dir without its ``_SUCCESS`` sentinel
        is a crashed generation; fail fast rather than ingest a partial feed.
        Plain files are chunked ``files_per_epoch`` at a time between feed
        boundaries."""
        if not os.path.isdir(input_path):
            return [[input_path]]
        epochs: list[list[str]] = []
        chunk: list[str] = []

        def flush():
            nonlocal chunk
            for i in range(0, len(chunk), files_per_epoch):
                epochs.append(chunk[i : i + files_per_epoch])
            chunk = []

        for name in sorted(os.listdir(input_path)):
            p = os.path.join(input_path, name)
            if name.endswith(".feed") and os.path.isdir(p):
                if not os.path.exists(os.path.join(p, "_SUCCESS")):
                    raise RuntimeError(
                        f"feed dir {p} has no _SUCCESS sentinel — its "
                        "generation crashed mid-write; re-run make_tombstones"
                        "/make_updates (idempotent) or remove the directory")
                flush()
                epochs.append(sorted(
                    glob.glob(os.path.join(p, "**", "*.parquet"),
                              recursive=True)))
            elif name.endswith(".parquet") and os.path.isfile(p):
                chunk.append(p)
        flush()
        return epochs

    def run(self, input_path: str, files_per_epoch: int = 1, max_epochs: int | None = None) -> dict:
        """Replay all (or the next ``max_epochs``) uncommitted epochs.
        Resumes from the silver manifest watermark.

        For big multi-epoch replays, bronze ingest of epoch k+1 runs in a
        background thread while silver merges epoch k (the reference's bronze
        and silver are independent streaming queries — ``silver/
        streaming_processor.py:50-75`` — so the overlap is semantically free):
        the merge phase's otherwise-idle read slots absorb the next epoch's
        scan/stamp/validate. Correctness is unchanged — bronze commits are
        per-epoch 2PC and the silver path only consumes committed bronze
        epochs, so a crash mid-prefetch resumes exactly as before. Two
        thread-safety invariants the overlap relies on: (1) manifest commits
        are a single same-filesystem ``os.rename`` (``state/table.py``), so a
        concurrent ``latest_manifest()`` read sees either the old or the new
        manifest, never a partial one; (2) dataset creation is serialized
        against DataContext mutation windows via ``_CTX_LOCK`` (see
        ``hash_shuffle_ctx``)."""
        import threading

        epochs = self.discover_epochs(input_path, files_per_epoch)
        sm = self.silver.latest_manifest()
        if sm is not None and sm.num_partitions != self.cfg.num_partitions:
            # pid assignment derives from cfg; replaying a lake created with
            # a different partition count would scatter keys across wrong
            # pids (first observed as an IndexError deep in resalt) — fail
            # fast with the fix instead
            raise ValueError(
                f"EngineConfig.num_partitions={self.cfg.num_partitions} does "
                f"not match this lake's manifest ({sm.num_partitions}); open "
                f"it with num_partitions={sm.num_partitions} or use a fresh "
                f"root")
        start = sm.epoch + 1
        end = len(epochs) if max_epochs is None else min(len(epochs), start + max_epochs)
        pipelined = (self.cfg.pipeline_epochs and end - start > 1
                     and sum(pq.read_metadata(f).num_rows for f in epochs[start] if os.path.exists(f))
                     >= self.cfg.hash_exchange_min_rows)

        def ensure_bronze(e: int) -> None:
            if self.bronze.latest_manifest().epoch < e:
                self._bronze_ingest(e, epochs[e])

        def prefetch_bronze(e: int) -> None:
            # best-effort: the main loop calls ensure_bronze(e) again after
            # join, so a failed prefetch (e.g. a concurrent lazy-import race
            # inside Ray's filesystem resolution surfacing as a plain
            # ImportError) degrades to the unfused inline path, never a crash
            try:
                ensure_bronze(e)
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "bronze prefetch of epoch %d failed; retrying inline", e,
                    exc_info=True)

        # premap mode: overlap epoch e+1's fused MAP phase (read → stamp →
        # validate → partition → bucketed bronze write) with epoch e's merge +
        # gold. Unlike the unfused bronze prefetch above, the premapped work is
        # never redone — the bucket files ARE the merge's shuffle input — so it
        # wins even on one node (the merge phase's straggler-idle slots absorb
        # the next epoch's scan). Engages per-epoch only when the next epoch
        # is big enough for the bronze_bucket exchange (_spawn_premap).
        premap_mode = (self.cfg.fuse_bronze and self.cfg.premap_epochs
                       and not pipelined and end - start > 1)
        done = 0
        prefetch: threading.Thread | None = None
        for e in range(start, end):
            if pipelined:
                if prefetch is not None:
                    prefetch.join()
                    prefetch = None
                ensure_bronze(e)
                if e + 1 < end:
                    prefetch = threading.Thread(target=prefetch_bronze, args=(e + 1,))
                    prefetch.start()
            cb = None
            if premap_mode and e + 1 < end:
                nxt = e + 1
                cb = (lambda nxt=nxt: self._spawn_premap(nxt, epochs[nxt]))
            self.run_epoch(e, epochs[e], on_map_done=cb)
            done += 1
        if prefetch is not None:
            prefetch.join()
        self._drain_premap()
        if self.cfg.gold_refresh_every_epochs:
            self.finalize_gold()
        else:
            self._join_gold()  # decoupled: gold advances only via GoldConsumer
        compacted = self._auto_compact() if done else None
        out_extra = {"auto_compacted": compacted} if compacted else {}
        return {
            "epochs_run": done,
            **out_extra,
            "silver_epoch": self.silver.latest_manifest().epoch,
            "gold_epoch": self.gold.latest_manifest().epoch,
            "stats": self.silver.latest_manifest().stats,
        }

    # ------------------------------------------------------------ one epoch
    def run_epoch(self, epoch: int, files: list[str], on_map_done=None) -> None:
        import time

        t0 = time.monotonic()
        # join + claim a premap of this epoch, if one was spawned during the
        # previous epoch's merge. Its map phase already ran presalt and pinned
        # the salt array it bucketed with — re-running presalt here could
        # raise salts past the pinned layout and corrupt the bucket/fragment
        # correspondence, so presalt is skipped and the resalt below aligns to
        # the PINNED array, not the (possibly newer) manifest map.
        premap = self._take_premap(epoch)
        bm = self.bronze.latest_manifest()
        sm = self.silver.latest_manifest()
        # pre-epoch hot-key detection: adaptive (post-epoch) salting reacts one
        # epoch late, which is one epoch too late when a replay has few big
        # epochs — a Zipf mega-repo then serializes its merge group and skews
        # the exchange (observed: 757k-row sort blocks vs 63k mean, 30 s merge
        # stragglers). Estimate this epoch's per-pid load from a sampled repo
        # column and raise desired salts BEFORE the resalt/merge.
        if premap is None:
            _tp = time.monotonic()
            self._presalt_from_sample(files)
            if os.environ.get("ENGINE_STATS"):
                print(f"[epoch {epoch}] presalt={time.monotonic() - _tp:.1f}s")
        # The resalt pass (align fragments to the post-presalt salt map)
        # touches only silver current fragments; the fused MAP phase touches
        # only input files + bronze. They overlap on a background thread —
        # _silver_merge joins the barrier before it resolves the fragment map
        # for the merge phase (the salt MAP itself is already final here:
        # resalt moves files, never the map).
        resalt_exc: list = []
        # snapshot the target layout ON THIS thread, before anything else can
        # commit: once the merge spawns a premap of the NEXT epoch, its presalt
        # may raise the manifest's salt map mid-flight, and a resalt thread
        # that read the manifest late would align fragments to the NEWER map
        # while this epoch's merge still buckets by the older one.
        desired_salts = (premap["salt_arr"] if premap is not None
                         else self._salt_array(self.silver.latest_manifest()))

        def _resalt_bg():
            _t = time.monotonic()
            try:
                self._maybe_resalt(desired=desired_salts)
            except BaseException as e:  # re-raised at the barrier
                resalt_exc.append(e)
            if os.environ.get("ENGINE_STATS"):
                print(f"[epoch {epoch}] resalt={time.monotonic() - _t:.1f}s (overlapped)")

        rt = threading.Thread(target=_resalt_bg)
        rt.start()

        def resalt_barrier():
            rt.join()
            if resalt_exc:
                raise resalt_exc[0]

        if bm.epoch < epoch and sm.epoch < epoch and self.cfg.fuse_bronze:
            # single-execution epoch: bronze write is a pass-through stage of
            # the merge pipeline (one Ray execution instead of two)
            self._silver_merge(epoch, input_files=files, pre_merge_barrier=resalt_barrier,
                               premap=premap, on_map_done=on_map_done)
        else:
            resalt_barrier()
            if bm.epoch < epoch:
                self._bronze_ingest(epoch, files)
            sm = self.silver.latest_manifest()
            if sm.epoch < epoch:
                self._silver_merge(epoch)
        resalt_barrier()  # idempotent; covers paths that skipped the merge
        if self.cfg.lookup_cache_keys:
            self._update_lookup_cache(epoch)
        gm = self.gold.latest_manifest()
        # cadence knob (reference: MV refresh every 10 ticks,
        # gold/streaming_processor.py:98-105): skipped epochs leave the gold
        # watermark lagging; the next refresh folds in all lineage since it.
        # 0/None = gold fully DECOUPLED — only a GoldConsumer advances it.
        cad = self.cfg.gold_refresh_every_epochs
        if cad and gm.epoch < epoch and (epoch + 1) % cad == 0:
            # gold reads the silver fragments committed THIS epoch (never
            # vacuumed mid-run) and commits only the gold manifest, so it can
            # overlap everything up to the next gold dispatch — the joins in
            # _spawn_gold / finalize_gold / read_gold order the commits.
            self._spawn_gold(epoch)
        self._record_progress(epoch, time.monotonic() - t0)

    # -------------------------------------------------- background gold refresh
    def _join_gold(self) -> None:
        if self._gold_thread is not None:
            self._gold_thread.join()
            self._gold_thread = None
        if self._gold_exc:
            raise self._gold_exc.pop(0)

    def _spawn_gold(self, epoch: int) -> None:
        self._join_gold()

        def bg():
            try:
                self._gold_refresh(epoch)
            except BaseException as e:
                self._gold_exc.append(e)

        self._gold_thread = threading.Thread(target=bg)
        self._gold_thread.start()

    # ------------------------------------------------------------- monitoring
    def _record_progress(self, epoch: int, duration_s: float) -> None:
        """Persist a per-epoch progress record (reference: per-stream
        ``lastProgress`` metrics surfaced by ``get_stream_metrics``,
        ``silver/cdf_processor.py:334-349``). One small JSON per epoch under
        ``<lake>/_progress`` — atomic rename, cheap at any scale (one file
        per epoch, not per task)."""
        lp = os.path.join(self.silver.root, "_lineage", f"epoch-{epoch}.json")
        rows_in = rows_applied = 0
        if os.path.exists(lp):
            for r in json.load(open(lp)):
                rows_in += int(r.get("rows_in", 0))
                rows_applied += int(r.get("rows_applied", 0))
        dur_ms = duration_s * 1e3
        rec = {
            "batch_id": epoch,
            "num_input_rows": rows_in,
            "num_applied_rows": rows_applied,
            "batch_duration_ms": round(dur_ms, 1),
            "input_rows_per_second": round(rows_in / duration_s, 1) if duration_s > 0 else 0.0,
            "processed_rows_per_second": round(rows_applied / duration_s, 1) if duration_s > 0 else 0.0,
            "silver_epoch": self.silver.latest_manifest().epoch,
            "gold_epoch": self.gold.latest_manifest().epoch,
        }
        pdir = os.path.join(self.root, "_progress")
        os.makedirs(pdir, exist_ok=True)
        dst = os.path.join(pdir, f"epoch-{epoch:010d}.json")
        with open(dst + ".tmp", "w") as f:
            json.dump(rec, f)
        os.replace(dst + ".tmp", dst)

    def last_progress(self) -> dict | None:
        """Most recent per-epoch progress record (``lastProgress`` analogue)."""
        pdir = os.path.join(self.root, "_progress")
        if not os.path.isdir(pdir):
            return None
        names = sorted(n for n in os.listdir(pdir) if n.endswith(".json"))
        if not names:
            return None
        return json.load(open(os.path.join(pdir, names[-1])))

    def stream_metrics(self) -> dict:
        """Reference-shaped stream metrics (``get_stream_metrics``,
        ``silver/cdf_processor.py:334-349``): last batch's rates + watermark
        status. ``status`` is 'active' while gold lags silver or silver lags
        bronze (work pending), else 'idle'."""
        p = self.last_progress() or {}
        bm, sm, gm = (self.bronze.latest_manifest(), self.silver.latest_manifest(),
                      self.gold.latest_manifest())
        pending = (sm.epoch < bm.epoch) or (gm.epoch < sm.epoch)
        return {
            "query_id": self.silver.latest_manifest().name,
            "status": "active" if pending else "idle",
            "batch_id": p.get("batch_id", -1),
            "num_input_rows": p.get("num_input_rows", 0),
            "batch_duration_ms": p.get("batch_duration_ms", 0),
            "input_rows_per_second": p.get("input_rows_per_second", 0.0),
            "processed_rows_per_second": p.get("processed_rows_per_second", 0.0),
            "bronze_epoch": bm.epoch, "silver_epoch": sm.epoch, "gold_epoch": gm.epoch,
        }

    def epoch_history(self) -> list[dict]:
        """All per-epoch progress records, oldest first (recentProgress)."""
        pdir = os.path.join(self.root, "_progress")
        if not os.path.isdir(pdir):
            return []
        return [json.load(open(os.path.join(pdir, n)))
                for n in sorted(os.listdir(pdir)) if n.endswith(".json")]

    def _update_lookup_cache(self, epoch: int) -> None:
        """MERGE each committed epoch's distinct key tuples into the lookup
        cache (G4; reference silver/streaming_processor.py:150-191). The cache
        has its own watermark, so a crash between the silver and cache commits
        replays the missed epochs from the committed bronze fragments here —
        one upsert per epoch keeps access_count exactly-once."""
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.state.cache import LookupCache

        cache = self.cache()
        keys = list(self.cfg.lookup_cache_keys)
        for e in range(cache.table.latest_manifest().epoch + 1, epoch + 1):
            paths = self._bronze_epoch_paths(e)
            if not paths:
                continue
            with _CTX_LOCK:
                # columns= prunes hive-inferred partition fields itself;
                # combining it with partitioning=None trips a Ray 2.49 bug
                # (see read_silver)
                upd = rd.read_parquet(paths, columns=keys)
            cache.upsert_epoch(upd, e)

    def cache(self):
        from maritime_activity_reports_cdc_ray.state.cache import LookupCache

        return LookupCache(os.path.join(self.root, "cache"))

    def restore(self, epoch: int) -> dict:
        """Roll silver AND gold back to their state as of ``epoch`` (Delta
        RESTORE analogue; reference: Delta's RESTORE + CDF reprocessing from
        ``startingVersion``, silver/cdf_processor.py:41). Bronze — the
        durable log — is never rolled back, so a subsequent ``run()``
        re-applies epochs > ``epoch`` from committed bronze and reconverges
        on exactly the same final state (exactly-once semantics make the
        re-application deterministic)."""
        self._join_gold()
        sm = self.silver.restore(epoch)
        gm = self.gold.restore(epoch)
        return {"silver_epoch": sm.epoch, "gold_epoch": gm.epoch}

    def clone(self, dst_root: str, as_of_epoch: int | None = None) -> "CDCReplay":
        """SHALLOW-CLONE the whole lake (bronze + silver + gold [+ cache])
        to ``dst_root`` — zero data copied; the clone's manifests reference
        this lake's fragment files (Delta ``CREATE TABLE ... SHALLOW CLONE``
        analogue, optionally ``VERSION AS OF`` via ``as_of_epoch``). The
        clone is a fully functional lake: reads (including the silver
        content-pointer join against its cloned bronze) work unchanged, and
        a ``run()`` on the clone appends new epochs under the clone's own
        roots — the dev/test-branch workflow — while the source is
        untouched. Vacuuming the CLONE never deletes source files; vacuuming
        the SOURCE can strand a clone, exactly as in Delta."""
        self._join_gold()
        dst = CDCReplay(dst_root, self.cfg)
        self.bronze.clone_to(dst.bronze.root, as_of_epoch)
        self.silver.clone_to(dst.silver.root, as_of_epoch)
        self.gold.clone_to(dst.gold.root, as_of_epoch)
        cache_root = os.path.join(self.root, "cache")
        if os.path.isdir(os.path.join(cache_root, "_manifests")):
            from maritime_activity_reports_cdc_ray.state.cache import _META

            dst_cache = os.path.join(dst_root, "cache")
            LakeTable(cache_root).clone_to(dst_cache, as_of_epoch)
            shutil.copy(os.path.join(cache_root, _META),
                        os.path.join(dst_cache, _META))
        return dst

    def make_tombstones(self, predicate: tuple, out_path: str) -> dict:
        """``DELETE FROM silver WHERE <predicate>`` as a DELETION FEED
        (GDPR/right-to-erasure shape; Delta analogue: ``DELETE FROM`` whose
        deletes surface in the CDF): write one tombstone event per LIVE key
        matching ``predicate`` to ``out_path`` — stream part file(s) the
        caller drops into the input dir as the NEXT epoch, so the deletes
        flow through the exactly-once replay path (bronze log, LWW merge,
        SCD2 close, gold/IVM/CDF all see them) instead of mutating state
        out-of-band. Epochs stay positional: the feed is data, not a
        side-channel commit.

        Tombstone commit = the key's winning commit numerically bumped by 1
        (strictly greater → wins LWW against the current state; a later
        REAL commit of the key re-inserts it, the CDC contract). The scan is
        a predicate-pruned, column-pruned silver read — never a full table —
        and the feed is produced by a STREAMING ``map_batches`` kernel
        (never a driver ``to_pandas()``): ``out_path`` ending in ``.feed``
        writes a multi-file feed directory (one replay epoch, see
        :meth:`discover_epochs`; idempotent — an existing ``_SUCCESS``
        short-circuits), ending in ``.parquet`` writes a single compat file
        (small feeds only — the whole feed passes through one worker task).

        On a watermark-enabled lake the feed carries an explicit
        ``event_time`` pinned to the current stream maximum, so tombstones
        for OLD keys (exactly the GDPR-erasure case) are never dropped as
        late — the stamper lets a source-supplied event_time win."""
        return self._make_feed(predicate, None, out_path)

    def make_updates(self, predicate: tuple, set_cols: dict,
                     out_path: str) -> dict:
        """``UPDATE silver SET col=value WHERE <predicate>`` as an UPDATE
        FEED — :meth:`make_tombstones`' companion, completing the DML triad
        (MERGE is the engine itself): one upsert event per matching LIVE
        key with the requested columns overridden, the rest (including
        content, resolved through the distributed pointer join) carried
        forward, and the commit numerically bumped so the event wins LWW.
        Applied via the normal replay path, so the update mints an SCD2
        version and a CDF pre/post pair like any organic change. Same
        streaming write contract as :meth:`make_tombstones` — content bytes
        move worker→worker, never through the driver."""
        return self._make_feed(predicate, dict(set_cols), out_path)

    def _make_feed(self, predicate: tuple, set_cols: dict | None,
                   out_path: str) -> dict:
        kind = "tombstones" if set_cols is None else "updates"
        is_dir = not out_path.endswith(".parquet")
        if is_dir and os.path.exists(os.path.join(out_path, "_SUCCESS")):
            files = sorted(glob.glob(os.path.join(out_path, "*.parquet")))
            n = sum(pq.read_metadata(f).num_rows for f in files)
            return {kind: n, "out": out_path, "files": len(files),
                    "skipped": True}
        cols = ["repo", "path", "commit"]
        extras: list = []
        if set_cols is not None:
            cols += [c for c in ("lang", "content") if c not in set_cols]
            # evolved payload columns ride along (override or carry-forward):
            # the bumped event WINS LWW, so omitting them would null them
            sm_schema = self.silver.latest_manifest().schema
            base = {f.name for f in SILVER_CURRENT_SCHEMA} | {"content"}
            extras = [f for f in (sm_schema or []) if f.name not in base]
            unknown = set(set_cols) - {"lang", "content"} \
                - {f.name for f in extras}
            if unknown:
                raise ValueError(
                    f"make_updates: SET columns {sorted(unknown)} are neither "
                    "base event columns nor evolved silver payload columns")
            cols += [f.name for f in extras if f.name not in set_cols]
        ds = self.read_silver(columns=cols, predicate=predicate)
        event_time = None
        if self.cfg.watermark_delay is not None:
            met = (self.bronze.latest_manifest().stats or {}).get("max_event_time")
            if met is not None:
                event_time = int(met)
        ds = ds.map_batches(_feed_kernel(set_cols, event_time, extras),
                            batch_format="pyarrow", zero_copy_batch=True)
        schema = _feed_schema(event_time is not None, extras)
        comp = self.cfg.write_compression
        if is_dir:
            shutil.rmtree(out_path, ignore_errors=True)
            ds.write_parquet(out_path, compression=comp)
            files = sorted(glob.glob(os.path.join(out_path, "*.parquet")))
            if not files:  # empty predicate match still yields a valid epoch
                os.makedirs(out_path, exist_ok=True)
                empty = os.path.join(out_path, "part-empty.parquet")
                pq.write_table(schema.empty_table(), empty, compression=comp)
                files = [empty]
            n = sum(pq.read_metadata(f).num_rows for f in files)
            open(os.path.join(out_path, "_SUCCESS"), "w").close()
            return {kind: n, "out": out_path, "files": len(files)}
        # single-file compat path: still streamed (one worker task writes
        # the merged block), but the whole feed sits in one object — fine
        # for the tombstone shape, avoid for content-carrying updates at scale
        tmp = out_path + ".tmp-feed"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.repartition(1).write_parquet(tmp, compression=comp)
        parts = sorted(glob.glob(os.path.join(tmp, "*.parquet")))
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        if len(parts) == 1:
            n = pq.read_metadata(parts[0]).num_rows
            os.replace(parts[0], out_path)
        elif parts:  # write_parquet split the single block (row limits etc.)
            t = pa.concat_tables([pq.read_table(f) for f in parts])
            n = t.num_rows
            pq.write_table(t, out_path, compression=comp)
        else:
            n = 0
            pq.write_table(schema.empty_table(), out_path, compression=comp)
        shutil.rmtree(tmp, ignore_errors=True)
        return {kind: n, "out": out_path, "files": 1}

    def _auto_compact(self) -> dict | None:
        """Threshold-based auto-OPTIMIZE at run end (the reference schedules
        ``optimize-tables`` via Airflow, ``airflow_dags/
        maritime_reports_cdc_dag.py``; here it is an engine knob): when any
        silver (pid, salt, kind) fragment chain exceeds
        ``cfg.auto_compact_min_chain``, compact history+current chains.
        Runs strictly AFTER the replay loop and gold finalize — no overlap
        with premap/presalt threads; the maintenance commit keeps the epoch
        watermark, so resume semantics are untouched."""
        thr = self.cfg.auto_compact_min_chain
        if not thr:
            return None
        from maritime_activity_reports_cdc_ray.pipelines.maintenance import compact_table

        out = compact_table(self.silver, kinds=("history", "current"),
                            compression=self.cfg.write_compression,
                            trigger_min_chain=thr)
        return out if out["compacted_groups"] else None

    def finalize_gold(self) -> None:
        """Bring gold up to the silver watermark regardless of cadence (also
        the crash-recovery path when a failure landed between the silver and
        gold commits of an epoch). Joins any in-flight background refresh
        first."""
        self._join_gold()
        sm, gm = self.silver.latest_manifest(), self.gold.latest_manifest()
        if gm.epoch < sm.epoch:
            self._gold_refresh(sm.epoch)

    # ----------------------------------------------------------------- bronze
    def _bronze_ingest(self, epoch: int, files: list[str]) -> None:
        """Unfused bronze ingest (reference pipeline §3.2): read → stamp →
        validate → partition → write fragments → commit."""
        import ray.data as rd

        cfg = self.cfg
        # creation (not execution) seals the DataContext — take the lock so a
        # concurrent hash_shuffle_ctx mutation can't leak into this plan when
        # this runs on the prefetch thread
        with _CTX_LOCK:
            ds = rd.read_parquet(files)
        ds = ds.map_batches(make_stamper(cfg, epoch), batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(make_validator(cfg, self._quarantine_dir(epoch),
                                           self._watermark_floor()),
                            batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(make_partitioner(cfg.num_partitions), batch_format="pyarrow", zero_copy_batch=True)
        outdir = self.bronze.abspath(f"fragments/epoch={epoch}")
        shutil.rmtree(outdir, ignore_errors=True)
        ds.write_parquet(outdir, compression=cfg.write_compression)
        self._commit_bronze_from_dir(epoch, files, outdir, None)

    def _commit_bronze_from_dir(self, epoch: int, input_files: list[str], outdir: str,
                                stamped_schema, known_rows: dict | None = None) -> None:
        """``known_rows`` (path → row count) lets the bucketed-writer path skip
        the per-file ``read_metadata`` — at thousands of bucket files a serial
        footer read per file costs seconds of driver time per epoch."""
        bm = self.bronze.latest_manifest()
        frags = []
        for fp in sorted(glob.glob(os.path.join(outdir, "*.parquet"))):
            nrows = (known_rows or {}).get(fp)
            if nrows is None:
                nrows = pq.read_metadata(fp).num_rows
            frags.append(
                Fragment(
                    path=os.path.relpath(fp, self.bronze.root),
                    pid=-1, salt=0, kind="data", epoch=epoch,
                    rows=int(nrows), bytes=os.path.getsize(fp),
                )
            )
        rows_in = sum(pq.read_metadata(f).num_rows for f in input_files)
        rows_kept = sum(f.rows for f in frags)
        # additive schema evolution on ingest (mergeSchema analogue,
        # bronze/cdc_ingestion.py:59)
        schema = bm.schema
        if frags:
            schema = union_schemas(
                schema, pq.read_schema(self.bronze.abspath(frags[-1].path))
            )
        stats_delta = {"rows_in": rows_in, "rows_kept": rows_kept}
        if self.cfg.watermark_delay is not None:
            met = self._epoch_max_event_time(
                [self.bronze.abspath(f.path) for f in frags])
            if met is not None:
                stats_delta["max_event_time"] = met
        self.bronze.commit_epoch(
            epoch, frags, schema=schema,
            lineage=[{"epoch": epoch, "rows_in": rows_in, "rows_kept": rows_kept,
                      "rows_dropped_invalid": rows_in - rows_kept, "files": len(frags)}],
            stats_delta=stats_delta,
        )

    @staticmethod
    def _epoch_max_event_time(paths: list[str]) -> int | None:
        """Max of the ``event_time`` column over the epoch's bronze fragments
        — METADATA ONLY (parquet footer column statistics, no row reads).
        Runs only when the watermark is enabled; per-fragment footers are the
        same ones the pruned-read paths already rely on."""
        best = None
        for fp in paths:
            md = pq.read_metadata(fp)
            try:
                idx = md.schema.to_arrow_schema().names.index("event_time")
            except ValueError:
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    v = int(st.max)
                    best = v if best is None else max(best, v)
        return best

    # ----------------------------------------------------------------- silver
    def _bronze_epoch_paths(self, epoch: int) -> list[str]:
        bm = self.bronze.latest_manifest()
        return [self.bronze.abspath(f.path) for f in bm.fragments if f.epoch == epoch and f.kind == "data"]

    def _choose_exchange(self, est_rows: int, fused: bool = False,
                         est_bytes: int | None = None) -> str:
        ex = self.cfg.merge_exchange
        small_ex = ("broadcast_task"
                    if est_bytes is not None
                    and est_bytes <= self.cfg.broadcast_exchange_max_bytes
                    else "sort_task")
        if ex == "auto":
            ex = ("bronze_bucket" if est_rows >= self.cfg.hash_exchange_min_rows
                  else small_ex)
        if ex == "bronze_bucket" and not fused:
            # resume path over already-committed bronze: no fused write to
            # piggyback the bucket split on — use the in-memory exchange
            ex = ("hash_actor" if est_rows >= self.cfg.hash_exchange_min_rows
                  else small_ex)
        if (ex == "broadcast_task" and est_bytes is not None
                and est_bytes > self.cfg.broadcast_exchange_max_bytes):
            # the byte gate holds even when broadcast_task is configured
            # explicitly: every merge task replicates the whole epoch, so a
            # large backfill epoch must demote to a real exchange
            ex = "sort_task"
        return ex

    def _silver_merge(self, epoch: int, input_files: list[str] | None = None,
                      pre_merge_barrier=None, premap: dict | None = None,
                      on_map_done=None) -> None:
        """Merge one epoch into silver.

        ``input_files`` set → fused mode: read raw events, stamp/validate,
        write bronze fragments as a pass-through stage, then exchange + merge —
        all in one Ray execution; bronze commits right after the execution,
        before silver (so a crash between the two commits resumes through the
        unfused path). ``input_files`` None → resume path reading the already
        -committed bronze epoch fragments.

        ``pre_merge_barrier``: joined before the current-fragment map is
        resolved — the overlapped resalt pass (run_epoch) may still be moving
        fragments until then. The salt MAP is final on entry (presalt commits
        before the barrier thread starts); only fragment PATHS change, so the
        bucketed map phase can run concurrently with it.
        """
        import ray
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.stages.merge import make_merge_task_fn

        barrier = pre_merge_barrier or (lambda: None)
        cfg = self.cfg
        ncpu = _cluster_cpus()
        sm = self.silver.latest_manifest()
        fused = input_files is not None
        if fused:
            src_files = input_files
            est_rows = sum(pq.read_metadata(f).num_rows for f in src_files)
            event_schema = pq.read_schema(src_files[0])
            from maritime_activity_reports_cdc_ray.schemas import BRONZE_SCHEMA

            stamped_schema = union_schemas(event_schema, BRONZE_SCHEMA)
            outdir = self.bronze.abspath(f"fragments/epoch={epoch}")
            if premap is None:  # a premap already populated the epoch dir
                shutil.rmtree(outdir, ignore_errors=True)
                os.makedirs(outdir, exist_ok=True)
        else:
            src_files = self._bronze_epoch_paths(epoch)
            if not src_files:
                self.silver.commit_epoch(epoch, [], lineage=[])
                return
            est_rows = sum(pq.read_metadata(f).num_rows for f in src_files)
            stamped_schema = pq.read_schema(src_files[0])
        silver_schema = union_schemas(silver_schema_for(stamped_schema), sm.schema)

        # with a premap, gid bucketing already happened under the PINNED salt
        # array — the merge must use the same one, not a fresh manifest read
        salt_arr = premap["salt_arr"] if premap is not None else self._salt_array(sm)
        nshuffle = cfg.resolved_shuffle_partitions(ncpu)
        est_bytes = sum(os.path.getsize(f) for f in src_files)
        exchange = self._choose_exchange(est_rows, fused=fused, est_bytes=est_bytes)
        if premap is not None:
            # the premap already ran its map phase under a specific exchange's
            # layout — the merge must follow it, not re-derive from estimates
            exchange = premap["exchange"]
        assert premap is None or exchange in ("bronze_bucket", "broadcast_task")

        def resolve_merge_args():
            """Join the resalt barrier, then snapshot the (post-resalt)
            fragment map. bronze_bucket defers this past its map phase; the
            in-memory exchanges need it before their single execution."""
            barrier()
            sm2 = self.silver.latest_manifest()
            fm = {(f.pid, f.salt): f.path for f in sm2.fragments if f.kind == "current"}
            return fm, (self.silver.root, ray.put(fm), epoch,
                        silver_schema.serialize().to_pybytes(), cfg.max_salt,
                        cfg.write_compression, cfg.detect_changes)

        # explicit block sizing (_map_nblocks): Ray's default parallelism
        # heuristic shreds a small epoch into ~100 tiny blocks and per-block
        # scheduling overhead swamps compute; target ~32 MB compressed per
        # block (at 100 TB scale this yields thousands of blocks — plenty of
        # parallelism; at sandbox scale it keeps per-block overhead
        # subordinate to compute).
        # For the sort/task exchange the post-sort block count == the input
        # block count and one merge task handles one block, so the block count
        # IS the merge parallelism — floor it at ~2 blocks per CPU (bounded by
        # the merge-group count) or the pool idles (observed: a 60k-row epoch
        # read as 6 blocks ran the whole merge on 6 of 32 cores).
        n_groups = int(salt_arr.sum())
        nblocks = _map_nblocks(ncpu, est_bytes, est_rows, n_groups)

        def build_source():
            if fused:
                ds = self._fused_map_prefix(src_files, epoch, nblocks)
                ds = ds.map_batches(_make_bronze_writer(outdir, cfg.write_compression),
                                    batch_format="pyarrow", zero_copy_batch=True)
                # payload is persisted: only metadata flows through the
                # exchange from here (content is ~80% of row bytes; the merge
                # stores a bronze pointer, never the bytes)
                ds = ds.map_batches(_drop_content, batch_format="pyarrow",
                                    zero_copy_batch=True)
            else:
                # resume path over committed bronze: prune content at the read
                # (columns= prunes hive partition fields too, so no
                # partitioning=None — Ray 2.49 rejects the combination)
                cols = [n for n in stamped_schema.names if n != "content"]
                ds = rd.read_parquet(src_files, columns=cols, override_num_blocks=nblocks)
            return ds.map_batches(
                make_gid_assigner(cfg.num_partitions, salt_arr, cfg.max_salt),
                batch_format="pyarrow", zero_copy_batch=True,
            )

        bronze_committed = False
        suppress_salt_adaptation = False
        if exchange == "bronze_bucket":
            # Map-side-file exchange: the mandatory bronze persist IS the
            # shuffle (see _make_bucketed_bronze_writer). Phase 1 streams
            # read→stamp→validate→partition→bucketed-write in one execution;
            # bronze commits (2PC point — a crash after this resumes through
            # the unfused path over the same files); phase 2 merges one task
            # per bucket, reading only that bucket's files. No object-store
            # all-to-all, no aggregator actors, no sort.
            assert fused, "bronze_bucket exchange requires the fused path"
            import time as _time

            _t0 = _time.monotonic()
            if premap is not None:
                meta = premap["meta"]
            else:
                # 4 waves' worth of buckets: finer tasks pack the merge pool's
                # straggler tail (at 2*ncpu the last wave idles half the cores).
                # GRAFT_BUCKET_WAVES overrides for tuning experiments.
                waves = int(os.environ.get("GRAFT_BUCKET_WAVES", "4"))
                nbuckets = int(max(1, min(n_groups, waves * ncpu)))
                ds = self._fused_map_prefix(src_files, epoch, nblocks)
                ds = ds.map_batches(
                    _make_bucketed_bronze_writer(outdir, cfg.write_compression, nbuckets,
                                                 salt_arr, cfg.max_salt),
                    batch_format="pyarrow", zero_copy_batch=True)
                meta = ds.take_all()  # one tiny row per written file
            _t1 = _time.monotonic()
            self._commit_bronze_from_dir(
                epoch, src_files, outdir, stamped_schema,
                known_rows={r["path"]: int(r["rows"]) for r in meta})
            bronze_committed = True
            # this epoch's map phase is over — overlap the NEXT epoch's map
            # (read→stamp→validate→bucketed write) with the merge below. Once
            # spawned, the next epoch's salt layout is pinned, so this epoch's
            # commit must not adapt the salt map (suppressed at the bottom).
            if on_map_done is not None:
                suppress_salt_adaptation = bool(on_map_done())
            _t2 = _time.monotonic()
            # the overlapped resalt pass ran concurrently with the map phase;
            # only now does the merge need the (post-resalt) fragment layout
            frag_map, merge_args = resolve_merge_args()
            by_bucket: dict[int, list[str]] = {}
            for r in meta:
                by_bucket.setdefault(int(r["bucket"]), []).append(r["path"])
            items = [{"paths": sorted(ps)} for _b, ps in sorted(by_bucket.items())]
            if items:
                res = rd.from_items(items, override_num_blocks=len(items)).map_batches(
                    _make_bucket_merge_fn(cfg.num_partitions, salt_arr, merge_args),
                    batch_format="pyarrow", batch_size=None,
                    num_cpus=cfg.merge_num_cpus)
                lineage_rows = res.take_all()
            else:
                res = None
                lineage_rows = []
            if os.environ.get("ENGINE_STATS"):
                print(f"[bronze_bucket e{epoch}] map={_t1 - _t0:.1f}s "
                      f"commit={_t2 - _t1:.1f}s merge={_time.monotonic() - _t2:.1f}s "
                      f"files={len(meta)} buckets={len(items)}")
        elif exchange == "broadcast_task":
            # Small-epoch path: ONE execution materializes the mapped epoch
            # into object-store blocks (and, when fused, persists bronze
            # fragments as a pass-through side effect — same 2PC point as
            # bronze_bucket: bronze commits before the merge execution, so a
            # crash in between resumes through the unfused path); the merge
            # execution then has no exchange at all (_make_broadcast_merge_fn).
            import time as _time

            _t0 = _time.monotonic()
            mat = premap["mat"] if premap is not None else build_source().materialize()
            _t1 = _time.monotonic()
            if fused:
                self._commit_bronze_from_dir(epoch, src_files, outdir, stamped_schema)
                bronze_committed = True
                if on_map_done is not None:
                    suppress_salt_adaptation = bool(on_map_done())
            frag_map, merge_args = resolve_merge_args()
            refs = mat.to_arrow_refs()
            # one task per bucket; 2 waves' worth caps scheduling overhead
            # while still packing the pool on a straggly tail
            nb = int(max(1, min(n_groups, 2 * ncpu)))
            items = [{"bucket": b} for b in range(nb)]
            res = rd.from_items(items, override_num_blocks=len(items)).map_batches(
                _make_broadcast_merge_fn(nb, merge_args, refs),
                batch_format="pyarrow", batch_size=None,
                num_cpus=cfg.merge_num_cpus)
            lineage_rows = res.take_all()
            if os.environ.get("ENGINE_STATS"):
                print(f"[broadcast e{epoch}] map={_t1 - _t0:.1f}s "
                      f"merge={_time.monotonic() - _t1:.1f}s buckets={nb}")
        elif exchange == "hash_actor":
            frag_map, merge_args = resolve_merge_args()
            # a Dataset seals its DataContext at CREATION, so only the plan
            # build sits inside the hash-shuffle scope; take_all() executes
            # with the sealed copy after the global context is restored
            with hash_shuffle_ctx():
                ds = build_source().repartition(nshuffle, keys=["gid"])
                # autoscaling pool (min, max): a fixed pool would reserve its
                # CPUs through the whole read+shuffle phase (starving reads),
                # then merge on only half the cluster. Min 1 avoids deadlock on
                # tiny clusters; max leaves the aggregators room.
                aggs = max(2, ncpu // 4)
                res = ds.map_batches(
                    MergeApplier,
                    fn_constructor_args=merge_args,
                    batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
                    concurrency=(max(1, ncpu // 4),
                                 max(2, min(nshuffle, ncpu - aggs - 2))),
                    num_cpus=cfg.merge_num_cpus,
                )
            lineage_rows = res.take_all()
        else:  # sort_task: warm-worker tasks, no actor spin-up per epoch
            frag_map, merge_args = resolve_merge_args()
            ds = build_source()
            # group by the scrambled gkey (see make_gid_assigner) so the
            # sort's range partitions interleave hot-pid sub-groups instead of
            # reuniting them in one straggler block
            res = ds.groupby("gkey").map_groups(
                make_merge_task_fn(*merge_args), batch_format="pyarrow",
            )
            lineage_rows = res.take_all()
        if os.environ.get("ENGINE_STATS") and res is not None:
            print(res.stats())

        if fused and not bronze_committed:
            self._commit_bronze_from_dir(epoch, src_files, outdir, stamped_schema)

        new_frags, replaced, lineage = [], set(), []
        stats_delta: dict = {}
        for r in lineage_rows:
            frs = [Fragment(**d) for d in json.loads(r["fragments_json"])]
            new_frags.extend(frs)
            for f in frs:
                if f.kind == "current":
                    old = frag_map.get((f.pid, f.salt))
                    if old:
                        replaced.add(old)
            lr = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                  for k, v in r.items() if k != "fragments_json"}
            lineage.append(lr)
            for k in ("rows_in", "rows_applied", "rows_stale", "rows_duplicate",
                      "rows_unchanged", "inserted", "updated", "deleted",
                      "history_rows"):
                stats_delta[k] = stats_delta.get(k, 0) + int(r[k])
        # while a premap of the next epoch is in flight its salt layout is
        # pinned — keep the manifest's (pinned) map and let adaptation resume
        # at the next non-premapped epoch boundary (presalt still raises
        # per-epoch; only lineage-driven halving is deferred)
        salt_map = None if suppress_salt_adaptation else self._next_salt_map(sm, lineage)
        with self._silver_commit_lock:
            self.silver.commit_epoch(
                epoch, new_frags, replaced=replaced, schema=silver_schema,
                lineage=lineage, salt_map=salt_map, stats_delta=stats_delta,
            )

    def _presalt_from_sample(self, files: list[str], sample_files: int = 2) -> None:
        """Sample the ``repo`` column of up to ``sample_files`` input files,
        project per-pid row counts to the whole epoch, and persist raised
        per-pid salts (max with current) so the resalt pass aligns fragments
        before the merge. Cost: a column-pruned read of ~2 files."""
        from maritime_activity_reports_cdc_ray.hashing import hash_strings

        sm = self.silver.latest_manifest()
        step = max(1, len(files) // sample_files)
        sample = files[::step][:sample_files]
        P = self.cfg.num_partitions
        counts = np.zeros(P, dtype=np.int64)
        sample_rows = 0
        for f in sample:
            t = pq.read_table(f, columns=["repo"])
            rh = hash_strings(t.column("repo"))
            counts += np.bincount((rh % np.uint64(P)).astype(np.int64), minlength=P)
            sample_rows += t.num_rows
        if not sample_rows:
            return
        total_rows = sum(pq.read_metadata(f).num_rows for f in files)
        est = counts * (total_rows / sample_rows)
        target = max(1, self.cfg.hot_partition_rows // 2)
        cur = self._salt_array(sm)
        out = dict(sm.salt_map)
        changed = False
        for pid in np.flatnonzero(est > target):
            want = min(self.cfg.max_salt,
                       int(2 ** np.ceil(np.log2(est[pid] / target))))
            if want > int(cur[pid]):
                out[str(int(pid))] = want
                changed = True
        if changed:
            base = max(1, self.cfg.default_salt)
            with self._silver_commit_lock:
                self.silver.commit_maintenance(
                    [], set(), salt_map={k: v for k, v in out.items() if v != base})

    def _salt_array(self, m) -> np.ndarray:
        s = np.ones(self.cfg.num_partitions, dtype=np.int64)
        if self.cfg.default_salt > 1:
            s[:] = self.cfg.default_salt
        for pid_str, v in m.salt_map.items():
            s[int(pid_str)] = v
        return s

    def _next_salt_map(self, m, lineage: list[dict]) -> dict:
        """Adapt per-pid salt from this epoch's event counts (hot-key
        detection from lineage — north_rule salted sub-partitioning)."""
        per_pid: dict[int, int] = {}
        for r in lineage:
            per_pid[r["pid"]] = per_pid.get(r["pid"], 0) + int(r["rows_in"])
        out = dict(m.salt_map)
        cur = self._salt_array(m)
        hot = self.cfg.hot_partition_rows
        for pid, rows in per_pid.items():
            s = int(cur[pid])
            # compare PER-GROUP load (rows/s), not the pid total: a pid that is
            # hot every epoch but already salted wide enough must not keep
            # doubling (observed: salt ratcheting to max_salt over a long
            # replay, with a full fragment rewrite each epoch and ever-smaller
            # fragments). Halving at rows/s < hot/4 leaves the halved groups
            # at < hot/2 — no double/halve oscillation.
            if rows // s > hot and s < self.cfg.max_salt:
                out[str(pid)] = min(self.cfg.max_salt, s * 2)
            elif rows // s < hot // 4 and s > max(1, self.cfg.default_salt):
                out[str(pid)] = max(max(1, self.cfg.default_salt), s // 2)
        return {k: v for k, v in out.items() if v != max(1, self.cfg.default_salt)}

    def _maybe_resalt(self, desired: np.ndarray | None = None) -> None:
        """Self-healing: re-slice any pid whose current-fragment layout
        disagrees with the desired salt map (runs before each merge; idempotent
        after crashes). Partition-local rewrites, committed as maintenance.

        ``desired``: explicit per-pid salt targets — a premapped epoch passes
        its PINNED salt array so the fragment layout matches the gid layout
        its bucket files were written with, even if a concurrent presalt for a
        later epoch has already raised the manifest's map further."""
        sm = self.silver.latest_manifest()
        if desired is None:
            desired = self._salt_array(sm)
        actual: dict[int, list] = {}
        for f in sm.fragments:
            if f.kind == "current":
                actual.setdefault(f.pid, []).append(f)
        todo = []
        for pid, frs in actual.items():
            have = 1 + max(fr.salt for fr in frs)
            if have != int(desired[pid]) or len(frs) != have:
                todo.append((pid, frs, int(desired[pid])))
        if not todo:
            return
        # one Ray task per pid (compaction's task-pool shape,
        # maintenance.make_compact_task_fn) — a hot mega-pid's fragments can
        # be GBs, so the read+re-slice+write must NOT run serially in the
        # driver; the driver only collects fragment descriptors and commits.
        import ray
        import ray.data as rd

        items = [{"pid": pid, "want": want, "epoch": sm.epoch,
                  "paths": [fr.path for fr in frs]} for pid, frs, want in todo]
        assert ray.is_initialized()
        res = rd.from_items(items).map_batches(
            _make_resalt_task_fn(self.silver.root, self.cfg.write_compression),
            batch_format="pyarrow", batch_size=1,
        ).take_all()
        new_frags, replaced = [], set()
        for r in res:
            new_frags.extend(Fragment(**d) for d in json.loads(r["fragments_json"]))
            replaced.update(json.loads(r["replaced_json"]))
        with self._silver_commit_lock:
            self.silver.commit_maintenance(new_frags, replaced)

    # ----------------------------------------------------------------- premap
    def _fused_map_prefix(self, files: list[str], epoch: int, nblocks: int):
        """The shared fused-map prefix every map path uses: read → stamp →
        validate → partition. ONE definition so premapped and inline epochs
        can never run with diverging stage order."""
        import ray.data as rd

        cfg = self.cfg
        ds = rd.read_parquet(files, partitioning=None, override_num_blocks=nblocks)
        ds = ds.map_batches(make_stamper(cfg, epoch), batch_format="pyarrow",
                            zero_copy_batch=True)
        ds = ds.map_batches(make_validator(cfg, self._quarantine_dir(epoch),
                                           self._watermark_floor()),
                            batch_format="pyarrow", zero_copy_batch=True)
        return ds.map_batches(make_partitioner(cfg.num_partitions),
                              batch_format="pyarrow", zero_copy_batch=True)

    def _watermark_floor(self) -> int | None:
        """Event-time watermark for the NEXT epoch's validator: the max event
        time over committed epochs (bronze manifest stats, monotone via the
        ``max_`` merge rule) minus the allowed lateness. None until a first
        epoch commits — the stream starts with no floor, like Spark's
        ``withWatermark``. With premap overlap the floor is read when the
        premap is CREATED (one epoch laxer than strictly sequential — a
        lower bound either way, so correctness only admits more, never drops
        on-time rows)."""
        if self.cfg.watermark_delay is None:
            return None
        bm = self.bronze.latest_manifest()
        met = (bm.stats or {}).get("max_event_time") if bm else None
        if met is None:
            return None
        return int(met) - int(self.cfg.watermark_delay)

    def _quarantine_dir(self, epoch: int, clear: bool = True) -> str | None:
        """Dead-letter dir for one epoch's rejected rows (None when the knob
        is off). Cleared once per map phase — driver-side, before any task
        writes — so a remap/rerun rewrites rather than duplicates."""
        if not self.cfg.quarantine_rejects:
            return None
        d = os.path.join(self.root, "quarantine", f"epoch={epoch}")
        if clear:
            shutil.rmtree(d, ignore_errors=True)
        return d

    def read_quarantine(self):
        """The dead-letter table: every row the validator rejected, across
        epochs, with its quality score/category and reject_reason — the audit
        surface for repair-and-replay."""
        import ray.data as rd

        files = sorted(glob.glob(os.path.join(
            self.root, "quarantine", "epoch=*", "*.parquet")))
        if not files:
            import pandas as pd

            return rd.from_pandas(pd.DataFrame({"repo": pd.Series(dtype="object"),
                                                "reject_reason": pd.Series(dtype="object")}))
        return rd.read_parquet(files, partitioning=None)

    def _premap_prologue(self, epoch: int, files: list[str]):
        """Shared premap setup: presalt, pin the salt array, size blocks,
        clear the epoch dir. Crash-safe: nothing is committed."""
        self._presalt_from_sample(files)
        sm = self.silver.latest_manifest()
        salt_arr = self._salt_array(sm)
        ncpu = _cluster_cpus()
        est_rows = sum(pq.read_metadata(f).num_rows for f in files)
        est_bytes = sum(os.path.getsize(f) for f in files)
        outdir = self.bronze.abspath(f"fragments/epoch={epoch}")
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir, exist_ok=True)
        n_groups = int(salt_arr.sum())
        nblocks = _map_nblocks(ncpu, est_bytes, est_rows, n_groups)
        return salt_arr, ncpu, n_groups, nblocks, outdir

    def _bucket_map_phase(self, epoch: int, files: list[str]) -> dict:
        """The fused MAP phase of one epoch, runnable ahead of its turn:
        presalt, pin the salt array, then read → stamp → validate → partition
        → bucketed bronze write (see _make_bucketed_bronze_writer). Returns
        everything the merge phase needs to pick the epoch up: the per-file
        bucket metadata and the pinned salt array. Crash-safe: nothing is
        committed — a rerun clears the epoch dir and remaps."""
        cfg = self.cfg
        salt_arr, ncpu, n_groups, nblocks, outdir = self._premap_prologue(epoch, files)
        waves = int(os.environ.get("GRAFT_BUCKET_WAVES", "4"))
        nbuckets = int(max(1, min(n_groups, waves * ncpu)))
        # dataset CREATION under the context lock (this runs on a background
        # thread; see hash_shuffle_ctx) — execution happens after release
        with _CTX_LOCK:
            ds = self._fused_map_prefix(files, epoch, nblocks)
            ds = ds.map_batches(
                _make_bucketed_bronze_writer(outdir, cfg.write_compression, nbuckets,
                                             salt_arr, cfg.max_salt),
                batch_format="pyarrow", zero_copy_batch=True)
        meta = ds.take_all()
        return {"meta": meta, "salt_arr": salt_arr, "exchange": "bronze_bucket"}

    def _broadcast_map_phase(self, epoch: int, files: list[str]) -> dict:
        """Premap variant for broadcast_task-sized (small) epochs: presalt,
        pin the salt array, then materialize the fused map pipeline (read →
        stamp → validate → partition → bronze write → gid assign) into
        object-store blocks the merge phase will broadcast. Crash-safe:
        nothing is committed — a rerun clears the epoch dir and remaps."""
        cfg = self.cfg
        salt_arr, _ncpu, _n_groups, nblocks, outdir = self._premap_prologue(epoch, files)
        with _CTX_LOCK:
            ds = self._fused_map_prefix(files, epoch, nblocks)
            ds = ds.map_batches(_make_bronze_writer(outdir, cfg.write_compression),
                                batch_format="pyarrow", zero_copy_batch=True)
            ds = ds.map_batches(_drop_content, batch_format="pyarrow",
                                zero_copy_batch=True)
            ds = ds.map_batches(
                make_gid_assigner(cfg.num_partitions, salt_arr, cfg.max_salt),
                batch_format="pyarrow", zero_copy_batch=True)
        mat = ds.materialize()
        return {"mat": mat, "salt_arr": salt_arr, "exchange": "broadcast_task"}

    def _spawn_premap(self, epoch: int, files: list[str]) -> bool:
        """Start epoch ``epoch``'s map phase on a background thread (premap),
        overlapping it with the CURRENT epoch's merge/gold. Returns True iff
        spawned — the caller must then pin the salt map (skip adaptation) so
        the premapped bucket layout stays valid. Best-effort: a premap failure
        degrades to the inline map phase, never a crash."""
        if self._premap is not None:
            return False
        cfg = self.cfg
        if not (cfg.fuse_bronze and cfg.premap_epochs):
            return False
        if cfg.merge_exchange not in ("auto", "bronze_bucket", "broadcast_task"):
            return False
        try:
            est = sum(pq.read_metadata(f).num_rows for f in files)
            est_bytes = sum(os.path.getsize(f) for f in files)
        except Exception:
            return False
        if est >= cfg.hash_exchange_min_rows:
            phase = self._bucket_map_phase
            if cfg.merge_exchange == "broadcast_task":
                return False
        elif (est_bytes <= cfg.broadcast_exchange_max_bytes
              and cfg.merge_exchange in ("auto", "broadcast_task")):
            phase = self._broadcast_map_phase
        else:
            return False  # mid-size next epoch takes the sort_task path inline
        if (self.bronze.latest_manifest().epoch >= epoch
                or self.silver.latest_manifest().epoch >= epoch):
            return False
        box: dict = {"epoch": epoch, "result": None}

        def bg():
            import logging
            import time as _time

            _t = _time.monotonic()
            try:
                box["result"] = phase(epoch, files)
            except Exception:
                logging.getLogger(__name__).warning(
                    "premap of epoch %d failed; falling back to the inline map",
                    epoch, exc_info=True)
            if os.environ.get("ENGINE_STATS"):
                print(f"[premap e{epoch}] map={_time.monotonic() - _t:.1f}s (overlapped)")

        t = threading.Thread(target=bg)
        box["thread"] = t
        self._premap = box
        self._premap_count += 1
        t.start()
        return True

    def _take_premap(self, epoch: int) -> dict | None:
        box, self._premap = self._premap, None
        if box is None:
            return None
        box["thread"].join()
        if box["epoch"] != epoch:
            return None
        return box["result"]

    def _drain_premap(self) -> None:
        box, self._premap = self._premap, None
        if box is not None:
            box["thread"].join()

    # ------------------------------------------------------------------- gold
    def _affected_repos_for_epoch(self, epoch: int) -> list[str]:
        lp = os.path.join(self.silver.root, "_lineage", f"epoch-{epoch}.json")
        if not os.path.exists(lp):
            return []
        with open(lp) as f:
            lineage = json.load(f)
        out: set[str] = set()
        for r in lineage:
            out.update(r.get("changed_repos", []))
        return sorted(out)

    def _gold_refresh(self, epoch: int) -> None:
        import time as _time

        _tg = _time.monotonic()
        self._gold_refresh_inner(epoch)
        if os.environ.get("ENGINE_STATS"):
            print(f"[gold e{epoch}] refresh={_time.monotonic() - _tg:.1f}s")

    @staticmethod
    def _scoped_current_paths(sm, pid: int, repos) -> list[str]:
        """Silver current fragments of ``pid`` that can contain ANY of the
        affected ``repos`` — manifest zone-map pruned (zero file opens): a
        lagging gold consumer catching up over a narrow repo set on a
        zone-mapped lake opens only the overlapping files. Fragments without
        stats (pre-zonemap manifests) are always kept — never drops a
        possibly-matching fragment (state/zonemap.py's contract)."""
        from maritime_activity_reports_cdc_ray.state.zonemap import \
            prune_fragments_by_stats

        cand = [f for f in sm.fragments
                if f.pid == pid and f.kind == "current"]
        return [f.path for f in prune_fragments_by_stats(
            cand, ("repo", "in", sorted(repos)))]

    def _gold_refresh_inner(self, epoch: int, pinned_silver=None) -> None:
        """Refresh gold to silver-state ``epoch``. ``pinned_silver`` reads a
        time-travel silver manifest instead of the latest — the decoupled
        :class:`GoldConsumer` uses it to step through historical epochs a
        lagging consumer has not caught up to yet (valid until vacuum)."""
        import ray
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.stages.partition import pid_of_repo

        # affected repos since the last *refreshed* gold epoch (covers skipped
        # cadence epochs too)
        gm = self.gold.latest_manifest()
        affected: set[str] = set()
        for e in range(gm.epoch + 1, epoch + 1):
            affected.update(self._affected_repos_for_epoch(e))
        if not affected:
            self.gold.commit_epoch(epoch, [], lineage=[])
            return
        sm = pinned_silver if pinned_silver is not None \
            else self.silver.latest_manifest()
        repos_by_pid: dict[int, list[str]] = {}
        for repo in sorted(affected):
            repos_by_pid.setdefault(pid_of_repo(repo, self.cfg.num_partitions), []).append(repo)
        gold_frag = {f.pid: f for f in gm.fragments if f.kind == "gold"}
        items = []
        for pid, repos in repos_by_pid.items():
            silver_paths = self._scoped_current_paths(sm, pid, repos)
            g = gold_frag.get(pid)
            items.append({"pid": pid, "silver_paths": silver_paths, "gold_path": g.path if g else ""})
        from maritime_activity_reports_cdc_ray.stages.gold import make_gold_task_fn

        ref = ray.put(repos_by_pid)
        ds = rd.from_items(items)
        res = ds.map_batches(
            make_gold_task_fn(self.silver.root, self.gold.root, ref, epoch,
                              self.cfg.write_compression),
            batch_format="pyarrow", batch_size=1,
        )
        rows = res.take_all()
        new_frags, replaced, lineage = [], set(), []
        for r in rows:
            for d in json.loads(r["fragments_json"]):
                f = Fragment(**d)
                new_frags.append(f)
                old = gold_frag.get(f.pid)
                if old:
                    replaced.add(old.path)
            lineage.append({k: int(v) for k, v in r.items() if k != "fragments_json"})
        assert GOLD_RESULT_SCHEMA is not None
        self.gold.commit_epoch(
            epoch, new_frags, replaced=replaced, lineage=lineage,
            stats_delta={"repos_refreshed": sum(int(r["repos_refreshed"]) for r in rows)},
        )

    # ---------------------------------------------------------------- readers
    def read_silver(self, live_only: bool = True, columns: list[str] | None = None,
                    as_of_epoch: int | None = None,
                    predicate: tuple | None = None):
        """Silver current state as a ray Dataset (streams fragment files).

        ``as_of_epoch`` pins the read to the table state right after that
        epoch committed (time travel — reference: Delta ``VERSION AS OF`` /
        CDF ``startingVersion``, silver/cdf_processor.py:41); default =
        latest. Pinned reads stay valid until ``vacuum()`` prunes history.

        ``predicate`` = ``(col, op, value)`` — or a list of such triples,
        ANDed — pushes a filter into the read (reference analogue: Delta
        partition filters + data skipping). Three pruning layers compose:
        an equality/IN conjunct on ``repo`` (the hash-partition key) prunes
        to the key's partition fragments, so a point read opens 1/P of the
        table's files; manifest zone maps (state.zonemap) skip fragments
        whose per-column min/max can't match ANY conjunct; and every
        predicate also reaches the parquet scanner for row-group pruning +
        exact row filtering. The virtual ``content`` column cannot be
        filtered (filter after read).

        ``content`` is a VIRTUAL column: silver fragments store a bronze
        pointer (``content_epoch``, see SILVER_CURRENT_SCHEMA) instead of the
        payload, so merges never move content bytes. When (and only when) the
        caller selects ``content``, this reader reconstructs it by joining
        (repo, path, commit, content_epoch) against the pointed-to bronze
        epochs — epoch-pruned via fragment footer statistics. Metadata-only
        reads (counts, gold refresh, stats) never touch payload bytes."""
        import pyarrow.compute as pc
        import ray.data as rd

        sm = (self.silver.latest_manifest() if as_of_epoch is None
              else self.silver.manifest_as_of(as_of_epoch))
        if sm.format_version < 2:
            raise RuntimeError(
                f"silver table at {self.silver.root} was written with on-disk "
                f"format v{sm.format_version} (materialized content column); "
                "this engine reads format v2 (content-pointer silver). "
                "Re-run the replay to rebuild the lake, or read the old lake "
                "with the matching engine version.")
        from maritime_activity_reports_cdc_ray.stages.partition import (
            normalize_predicate, predicate_expression, prune_fragments_by_key)
        from maritime_activity_reports_cdc_ray.state.zonemap import (
            prune_fragments_by_stats)

        frags = [f for f in sm.fragments if f.kind == "current"]
        read_kwargs: dict = {}
        if predicate is not None:
            if any(t[0] == "content" for t in normalize_predicate(predicate)):
                raise ValueError("cannot filter on the virtual 'content' column "
                                 "— select it and filter after the read")
            if sm.schema is not None:
                from maritime_activity_reports_cdc_ray.stages.partition import (
                    validate_predicate_columns)
                avail = {f.name for f in sm.schema}
                for fr in frags:
                    avail |= set(fr.cols or ())
                validate_predicate_columns(predicate, avail, "silver")
            frags = prune_fragments_by_key(frags, predicate, sm.num_partitions)
            frags = prune_fragments_by_stats(frags, predicate)
            read_kwargs["filter"] = predicate_expression(predicate)
        paths = [self.silver.abspath(f.path) for f in frags]
        stored_names = [f.name for f in sm.schema] if sm.schema is not None else \
            [f.name for f in SILVER_CURRENT_SCHEMA]
        user_names = ["content" if n == "content_epoch" else n for n in stored_names]
        out_cols = list(columns) if columns is not None else user_names
        wants_content = "content" in out_cols
        if not paths:
            base = sm.schema if sm.schema is not None else SILVER_CURRENT_SCHEMA
            fields = [pa.field("content", pa.large_string()) if n == "content"
                      else base.field(n) for n in out_cols]
            return rd.from_arrow(pa.Table.from_pylist([], schema=pa.schema(fields)))

        read_cols = [c for c in out_cols if c != "content"]
        if wants_content:
            read_cols += [c for c in ("repo", "path", "commit", "content_epoch",
                                      "is_deleted") if c not in read_cols]
        if live_only and "is_deleted" not in read_cols:
            read_cols.append("is_deleted")
        # explicit columns also prune hive-inferred partition fields (Ray 2.49
        # rejects columns= together with partitioning=None)
        base_names = {f.name for f in SILVER_CURRENT_SCHEMA}
        if any(c not in base_names for c in read_cols):
            # evolved columns requested: fragments committed BEFORE the
            # additive evolution don't store them — group fragments by what
            # they actually store (manifest-recorded `cols`; one footer read
            # per fragment only for legacy manifests) and null-backfill,
            # the same contract as table_changes
            from maritime_activity_reports_cdc_ray.stages.merge import align_to_schema

            need_schema = pa.schema([sm.schema.field(c) for c in read_cols])
            pred_cols = ({t[0] for t in normalize_predicate(predicate)}
                         if predicate is not None else set())
            by_cols: dict[tuple, list[str]] = {}
            for f in frags:
                names = set(f.cols) if f.cols is not None else \
                    set(pq.read_schema(self.silver.abspath(f.path)).names)
                if pred_cols - names:
                    # a conjunct references a column this (pre-evolution)
                    # fragment doesn't store: every row backfills to NULL
                    # there, and no predicate op matches NULL (None-in-IN is
                    # rejected by normalize_predicate) — the fragment
                    # contributes nothing, and passing the filter to the
                    # scanner would raise on the missing field. Skip it.
                    continue
                by_cols.setdefault(
                    tuple(c for c in read_cols if c in names), []) \
                    .append(self.silver.abspath(f.path))
            parts = []
            for cols_av, ps in by_cols.items():
                d = rd.read_parquet(ps, columns=list(cols_av), **read_kwargs)
                if set(cols_av) != set(read_cols):
                    d = d.map_batches(
                        lambda t, _s=need_schema: align_to_schema(t, _s),
                        batch_format="pyarrow", zero_copy_batch=True)
                parts.append(d)
            if not parts:  # every fragment lacked a predicate column
                fields = [pa.field("content", pa.large_string()) if n == "content"
                          else sm.schema.field(n) for n in out_cols]
                return rd.from_arrow(pa.Table.from_pylist([], schema=pa.schema(fields)))
            ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        else:
            ds = rd.read_parquet(paths, columns=read_cols, **read_kwargs)
        if live_only:
            ds = ds.map_batches(
                lambda t: t.filter(pc.invert(t.column("is_deleted"))),
                batch_format="pyarrow", zero_copy_batch=True)
        if wants_content:
            ds = self._attach_content(ds, frags, as_of_epoch=as_of_epoch)
        if out_cols != read_cols:  # drop join keys / flags the caller didn't ask for
            ds = ds.map_batches(lambda t: t.select(out_cols),
                                batch_format="pyarrow", zero_copy_batch=True)
        return ds

    def _attach_content(self, meta_ds, silver_frags: list,
                        as_of_epoch: int | None = None):
        """Join the virtual ``content`` column onto a silver meta Dataset.

        Bronze side = only the epochs any live row points to (bounded by
        per-fragment ``content_epoch`` ranges — manifest zone maps when
        present, a metadata-only footer pass for pre-zonemap fragments),
        deduped to the same winner the merge kernel applied (lowest
        ``cdc_sequence_number`` per (repo, path, commit, epoch)); tombstones
        come back null (their bronze row holds the TOMBSTONE sentinel). At
        scale this is a fact-to-fact hash join paid only by content-selecting
        readers — the replay loop itself never runs it."""
        import pyarrow.compute as pc
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.functions.dedup import exact_dedup
        from maritime_activity_reports_cdc_ray.functions.join import auto_join

        lo, hi = None, None
        for f in silver_frags:
            zst = (f.zmap or {}).get("content_epoch")
            if zst is not None and zst[0] is not None and zst[1] is not None:
                flo, fhi = zst[0], zst[1]
            else:
                p = self.silver.abspath(f.path)
                md = pq.read_metadata(p)
                try:
                    ci = pq.read_schema(p).names.index("content_epoch")
                    flo = fhi = None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        flo = st.min if flo is None else min(flo, st.min)
                        fhi = st.max if fhi is None else max(fhi, st.max)
                except (ValueError, AttributeError):
                    lo, hi = None, None
                    break
            lo = flo if lo is None else min(lo, flo)
            hi = fhi if hi is None else max(hi, fhi)
        bm = (self.bronze.latest_manifest() if as_of_epoch is None
              else self.bronze.manifest_as_of(as_of_epoch))
        files = [self.bronze.abspath(f.path) for f in bm.fragments
                 if f.kind == "data" and (lo is None or lo <= f.epoch <= hi)]

        def null_content(t: pa.Table) -> pa.Table:
            return t.append_column("content", pa.nulls(t.num_rows, pa.large_string()))

        if not files:
            return meta_ds.map_batches(null_content, batch_format="pyarrow",
                                       zero_copy_batch=True)
        cds = rd.read_parquet(files, columns=["repo", "path", "commit", "epoch",
                                              "cdc_sequence_number", "content"])
        # same winner the kernel applied: equal (key, commit) events within an
        # epoch dedup to the lowest content-derived sequence number
        cds = exact_dedup(cds, cols=["repo", "path", "commit", "epoch"],
                          order=["cdc_sequence_number"], id_col="epoch")
        cds = cds.map_batches(
            lambda t: t.select(["repo", "path", "commit", "epoch", "content"])
                       .rename_columns(["_c_repo", "_c_path", "_c_commit",
                                        "_c_epoch", "content"]),
            batch_format="pyarrow", zero_copy_batch=True)
        joined = auto_join(meta_ds, cds,
                           on=["repo", "path", "commit", "content_epoch"],
                           right_on=["_c_repo", "_c_path", "_c_commit", "_c_epoch"],
                           how="left")

        def finish(t: pa.Table) -> pa.Table:
            c = t.column("content")
            if c.type != pa.large_string():
                c = c.cast(pa.large_string())
            if "is_deleted" in t.column_names:  # sentinel rows join too — null them
                c = pc.if_else(t.column("is_deleted"),
                               pa.scalar(None, pa.large_string()), c)
            drop = [n for n in ("_c_repo", "_c_path", "_c_commit", "_c_epoch",
                                "content") if n in t.column_names]
            return t.drop_columns(drop).append_column("content", c)

        return joined.map_batches(finish, batch_format="pyarrow")

    def table_changes(self, from_epoch: int | None, to_epoch: int | None = None,
                      columns: list[str] | None = None):
        """Net per-key change feed between two committed epochs — the CDF
        *read* side (reference: Delta ``table_changes`` / readChangeFeed,
        the source ``silver/cdf_processor.py:41`` consumes). One row per key
        whose current state differs between the manifest as of ``from_epoch``
        and as of ``to_epoch`` (default latest), Delta CDF column convention:
        ``_change_type`` in {'insert', 'update_preimage', 'update_postimage',
        'delete'}; updates emit both images. ``from_epoch=None`` = table
        start (everything live at ``to_epoch`` is an insert). Net semantics:
        a key updated five times in the range emits one pre/post pair;
        per-version granularity remains available via ``read_history``.

        Scale shape: pids whose current-fragment path sets are IDENTICAL in
        the two manifests cannot have changed and are pruned before any file
        opens (an epoch touches few pids); the surviving fragments are
        metadata-only column-pruned reads (content never moves); the diff is
        one vectorized outer-merge kernel per hash partition of the key."""
        import pandas as pd
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

        base_cols = ["repo", "path", "commit", "lang", "content_sha256",
                     "content_bytes"]
        out_cols = list(columns) if columns is not None else base_cols
        need = list(dict.fromkeys(["repo", "path", "commit", "is_deleted"]
                                  + out_cols))
        sm_t = (self.silver.latest_manifest() if to_epoch is None
                else self.silver.manifest_as_of(to_epoch))
        sm_f = (None if from_epoch is None or from_epoch < 0
                else self.silver.manifest_as_of(from_epoch))
        if sm_f is not None and sm_f.epoch > sm_t.epoch:
            # an inverted range would silently swap insert/delete labels and
            # pre/post images — a caller typo must fail loudly instead
            raise ValueError(
                f"table_changes: from_epoch {from_epoch} resolves past "
                f"to_epoch {sm_t.epoch} — inverted range")

        def by_pid(m):
            d: dict[int, list] = {}
            if m is not None:
                for f in m.fragments:
                    if f.kind == "current":
                        d.setdefault(f.pid, []).append(f)
            return d
        old_p, new_p = by_pid(sm_f), by_pid(sm_t)
        changed = [pid for pid in set(old_p) | set(new_p)
                   if sorted(f.path for f in old_p.get(pid, []))
                   != sorted(f.path for f in new_p.get(pid, []))]
        schema = pa.schema([sm_t.schema.field(c) if c in sm_t.schema.names
                            else pa.field(c, pa.string()) for c in out_cols]
                           + [pa.field("_change_type", pa.string())])
        empty = rd.from_arrow(pa.Table.from_pylist([], schema=schema))
        if not changed:
            return empty

        from maritime_activity_reports_cdc_ray.stages.merge import align_to_schema

        need_schema = pa.schema(
            [sm_t.schema.field(c) if c in sm_t.schema.names
             else pa.field(c, pa.string()) for c in need])

        def side(pmap, tag):
            side_frags = [f for pid in changed for f in pmap.get(pid, [])]
            if not side_frags:
                return None
            # a pid untouched since before an additive evolution still holds
            # a pre-evolution fragment file — group fragments by the columns
            # they actually store (manifest-recorded; footer read only for
            # legacy manifests) and null-backfill
            by_cols: dict[tuple, list[str]] = {}
            for f in side_frags:
                p = self.silver.abspath(f.path)
                names = set(f.cols) if f.cols is not None else \
                    set(pq.read_schema(p).names)
                by_cols.setdefault(tuple(c for c in need if c in names), []).append(p)
            parts = []
            for cols, ps in by_cols.items():
                d = rd.read_parquet(ps, columns=list(cols))
                parts.append(d.map_batches(
                    lambda t, _s=need_schema: align_to_schema(t, _s),
                    batch_format="pyarrow", zero_copy_batch=True))
            ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
            return ds.map_batches(
                lambda t: t.append_column(
                    "_side", pa.array(np.full(t.num_rows, tag, np.int8))),
                batch_format="pyarrow", zero_copy_batch=True)
        P = sm_t.num_partitions
        sides = [s for s in (side(old_p, 0), side(new_p, 1)) if s is not None]
        un = sides[0] if len(sides) == 1 else sides[0].union(sides[1])

        def add_part(t: pa.Table) -> pa.Table:
            kdf = pd.DataFrame({"repo": t.column("repo").to_pandas(),
                                "path": t.column("path").to_pandas()})
            return t.append_column(
                "_part", pa.array(_hash_part(kdf, ["repo", "path"], P)))
        un = un.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)

        def diff(g: pd.DataFrame) -> pd.DataFrame:
            old = g[g["_side"] == 0]
            new = g[g["_side"] == 1]
            j = old.merge(new, on=["repo", "path"], how="outer",
                          suffixes=("_o", "_n"), indicator=True)
            # absent side ⇒ is_deleted_* is NaN, and NaN.eq(False) is False —
            # exactly "not live" — so no fillna/downcast dance is needed
            old_live = (j["_merge"] != "right_only") & j["is_deleted_o"].eq(False)
            new_live = (j["_merge"] != "left_only") & j["is_deleted_n"].eq(False)

            def pick(mask, suf, ctype):
                sel = j[mask]
                d = {c: sel[c] if c in ("repo", "path") else sel[f"{c}{suf}"]
                     for c in out_cols}
                out = pd.DataFrame(d)
                out["_change_type"] = ctype
                return out
            changed_commit = old_live & new_live & (j["commit_o"] != j["commit_n"])
            parts = [pick(~old_live & new_live, "_n", "insert"),
                     pick(changed_commit, "_o", "update_preimage"),
                     pick(changed_commit, "_n", "update_postimage"),
                     pick(old_live & ~new_live, "_o", "delete")]
            out = pd.concat(parts, ignore_index=True)

            # build the Arrow block EXPLICITLY against the declared schema:
            # pandas' outer-merge NaN promotion would otherwise corrupt int/
            # bool dtypes, and Ray's pandas block rebuild TensorArray-casts
            # ragged nested (list/struct) evolved columns
            def to_arrow(col: pd.Series, typ: pa.DataType) -> pa.Array:
                if pa.types.is_nested(typ):
                    vals = [None if v is None
                            or (isinstance(v, float) and np.isnan(v))
                            else (list(v) if pa.types.is_list(typ)
                                  or pa.types.is_large_list(typ) else v)
                            for v in col]
                    return pa.array(vals, type=typ)
                return pa.array(col, type=typ, from_pandas=True)

            cols = {c: to_arrow(out[c], schema.field(c).type) for c in out_cols}
            cols["_change_type"] = pa.array(out["_change_type"], pa.string())
            return pa.table(cols)

        return un.groupby("_part").map_groups(diff, batch_format="pandas")

    def read_gold(self, as_of_epoch: int | None = None,
                  predicate: tuple | None = None,
                  columns: list[str] | None = None):
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.stages.partition import (
            predicate_expression, prune_fragments_by_key)
        from maritime_activity_reports_cdc_ray.state.zonemap import (
            prune_fragments_by_stats)

        self._join_gold()  # surface the committed state, not a mid-refresh one
        gm = (self.gold.latest_manifest() if as_of_epoch is None
              else self.gold.manifest_as_of(as_of_epoch))
        frags = [f for f in gm.fragments if f.kind == "gold"]
        read_kwargs: dict = {}
        if predicate is not None:
            from maritime_activity_reports_cdc_ray.stages.partition import (
                validate_predicate_columns)
            avail = {f.name for f in (gm.schema if gm.schema is not None
                                      else GOLD_SCHEMA)}
            for fr in frags:
                avail |= set(fr.cols or ())
            validate_predicate_columns(predicate, avail, "gold")
            frags = prune_fragments_by_key(frags, predicate, gm.num_partitions)
            frags = prune_fragments_by_stats(frags, predicate)
            read_kwargs["filter"] = predicate_expression(predicate)
        paths = [self.gold.abspath(f.path) for f in frags]
        if not paths:
            t = pa.Table.from_pylist([], schema=GOLD_SCHEMA)
            return rd.from_arrow(t.select(columns) if columns else t)
        ds = rd.read_parquet(paths, partitioning=None, **read_kwargs)
        if columns is not None:
            # select_columns, not read_parquet(columns=...): Ray's projection
            # pushdown moves it into the scan, and read_parquet's own columns=
            # arg is broken under partitioning=None (UnboundLocalError in
            # parquet_datasource._infer_user_specified_columns, ray 2.49)
            ds = ds.select_columns(list(columns))
        return ds

    def read_history(self, as_of_epoch: int | None = None,
                     predicate: tuple | None = None):
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.schemas import SILVER_HISTORY_SCHEMA
        from maritime_activity_reports_cdc_ray.stages.partition import (
            predicate_expression, prune_fragments_by_key)
        from maritime_activity_reports_cdc_ray.state.zonemap import (
            prune_fragments_by_stats)

        sm = (self.silver.latest_manifest() if as_of_epoch is None
              else self.silver.manifest_as_of(as_of_epoch))
        frags = [f for f in sm.fragments if f.kind == "history"]
        read_kwargs: dict = {}
        if predicate is not None:
            from maritime_activity_reports_cdc_ray.stages.partition import (
                validate_predicate_columns)
            # history carries the silver payload (incl. evolved columns) plus
            # its own versioning fields — union everything known, so the check
            # can only reject a column present nowhere
            avail = {f.name for f in SILVER_HISTORY_SCHEMA}
            if sm.schema is not None:
                avail |= {f.name for f in sm.schema}
            for fr in frags:
                avail |= set(fr.cols or ())
            validate_predicate_columns(predicate, avail, "history")
            frags = prune_fragments_by_key(frags, predicate, sm.num_partitions)
            frags = prune_fragments_by_stats(frags, predicate)
            read_kwargs["filter"] = predicate_expression(predicate)
        paths = [self.silver.abspath(f.path) for f in frags]
        if not paths:
            return rd.from_arrow(pa.Table.from_pylist([], schema=SILVER_HISTORY_SCHEMA))
        return rd.read_parquet(paths, partitioning=None, **read_kwargs)


assert EVENT_SCHEMA is not None
