"""Join strategies: broadcast hash join + size-adaptive strategy selection.

Reference semantics: the reporting queries join a large fact edge to one or
more much smaller dimension/aggregate sides (`gold/report_generator.py`
status joins, `silver/cdf_processor.py` dim lookups). Spark picks broadcast
vs shuffle join automatically from size estimates
(`spark.sql.autoBroadcastJoinThreshold`); Ray Data's ``Dataset.join`` is
always a shuffle hash join. This module supplies the missing half and the
selector:

- :func:`broadcast_join` — ``ray.put`` the small side ONCE, pandas-merge it
  into every batch of the big side. No shuffle at all: the big side streams
  through a task-pool `map_batches` and never moves between nodes. The
  broadcast is resolved once per WORKER (module-level cache keyed by the
  ObjectRef), not once per batch.
- :func:`auto_join` — count the right side (cheap for parquet-backed inputs:
  metadata only) and pick broadcast when it fits comfortably in a worker
  heap, else fall back to ``Dataset.join``. This is the join a 100 TB
  pipeline wants: dimensions broadcast, fact-to-fact shuffles.

Scale notes: a broadcast join is O(|small|) memory per WORKER (not per task
— the object store shares one copy per node), so the limit is rows the
deserialized frame occupies in a worker heap, default 2M rows. Skewed join
keys are harmless here (no partitioning on the key at all), which also makes
broadcast the right fallback for hot-key joins that would straggle a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from maritime_activity_reports_cdc_ray.functions.dedup import _WORKER_CACHE, _cache_put

_HOW_TO_RAY = {"inner": "inner", "left": "left_outer", "left_outer": "left_outer"}


def _resolve(ref):
    """ray.get a broadcast once per worker process."""
    key = ref.hex()
    val = _WORKER_CACHE.get(key)
    if val is None:
        import ray

        val = _cache_put(key, ray.get(ref))
    return val


def broadcast_join(big_ds, small, on: list[str],
                   right_on: list[str] | None = None, how: str = "inner",
                   select: list[str] | None = None):
    """Join ``big_ds`` (Dataset) with a driver-resident small side (a pandas
    frame or a pyarrow Table).

    ``how`` ∈ {"inner", "left"}; both key columns are kept (matching
    ``Dataset.join``'s output shape, so callers can swap strategies freely).
    ``select`` optionally projects the merged frame — pushing the projection
    into the same task avoids materializing unused columns downstream.

    Arrow-native kernel: only the KEY columns round-trip through pandas (for
    its hash-merge); payload columns — including large_string content and
    nested list/struct evolved columns, which pandas block rebuilds would
    mangle into TensorArray casts — move via zero-copy ``take`` on the Arrow
    batch and the broadcast Table. pandas-merge column semantics are kept:
    a right key sharing the left key's name collapses into one column,
    overlapping non-key names get ``_x``/``_y`` suffixes, left row order is
    preserved.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    assert how in ("inner", "left"), how
    right_on = list(right_on or on)
    on = list(on)
    s_tbl = small if isinstance(small, pa.Table) else \
        pa.Table.from_pandas(small, preserve_index=False)
    sref = ray.put(s_tbl.combine_chunks())

    def merge(t: pa.Table) -> pa.Table:
        s: pa.Table = _resolve(sref)
        kk = sref.hex() + ":keys"
        rdf = _WORKER_CACHE.get(kk)
        if rdf is None:  # right keys → pandas once per worker, not per batch
            rdf = _cache_put(kk, pd.DataFrame(
                {c: s.column(c).to_pandas() for c in right_on}).assign(
                __ri=np.arange(s.num_rows, dtype=np.int64)))
        ldf = pd.DataFrame({c: t.column(c).to_pandas() for c in on})
        ldf["__li"] = np.arange(t.num_rows, dtype=np.int64)
        m = ldf.merge(rdf, left_on=on, right_on=right_on, how=how)
        left_out = t.take(pa.array(m["__li"].to_numpy(np.int64)))
        ri = pa.array(pd.array(m["__ri"], dtype="Int64"), type=pa.int64())
        same_key = {rc for lc, rc in zip(on, right_on) if lc == rc}
        right_names = [c for c in s.column_names if c not in same_key]
        overlap = set(left_out.column_names) & set(right_names)
        if overlap:
            left_out = left_out.rename_columns(
                [f"{c}_x" if c in overlap else c for c in left_out.column_names])
        out = left_out
        for c in right_names:
            out = out.append_column(f"{c}_y" if c in overlap else c,
                                    pc.take(s.column(c), ri))
        return out.select(select) if select else out

    return big_ds.map_batches(merge, batch_format="pyarrow")


def auto_join(left, right, on: list[str], right_on: list[str] | None = None,
              how: str = "inner", num_partitions: int = 8,
              broadcast_limit_rows: int = 2_000_000,
              broadcast_limit_bytes: int = 256 << 20,
              select: list[str] | None = None):
    """Spark-style join-strategy selection for Ray Data.

    If ``right`` has at most ``broadcast_limit_rows`` rows it is collected
    and broadcast (zero-shuffle); otherwise the join runs as Ray's
    partitioned hash join. The right side is pinned with ``materialize()``
    first so the size probe and the subsequent collect (or shuffle) run its
    pipeline exactly once — ``count()`` on a lazy pipeline followed by
    ``to_pandas()`` would execute it twice (measured: q3 6.9 s → 16.5 s).
    Blocks stay in the object store, never on the driver, so the pin is safe
    even when the row count forces the shuffle path.
    """
    right_on = list(right_on or on)
    right = right.materialize()
    # gate on BYTES as well as rows: a payload-carrying right side (e.g. the
    # bronze-content side of read_silver's virtual-content join) can be few
    # rows but many GB — broadcasting it would land whole on the driver heap
    if (right.count() <= broadcast_limit_rows
            and (right.size_bytes() or 0) <= broadcast_limit_bytes):
        import pyarrow as pa
        import ray

        # collect the small side as ARROW blocks — a to_pandas() here would
        # object-box large_string payloads and nested columns just to have
        # broadcast_join convert them straight back. A stage that produced
        # pandas blocks hands DataFrames through to_arrow_refs; convert those.
        blocks = [b if isinstance(b, pa.Table)
                  else pa.Table.from_pandas(b, preserve_index=False)
                  for b in ray.get(right.to_arrow_refs())]
        s_tbl = pa.concat_tables(blocks, promote_options="default") if blocks \
            else right.to_pandas()
        return broadcast_join(left, s_tbl, on, right_on,
                              how="left" if how == "left_outer" else how,
                              select=select)
    joined = left.join(right, join_type=_HOW_TO_RAY[how],
                       num_partitions=num_partitions,
                       on=tuple(on), right_on=tuple(right_on))
    if select:
        joined = joined.select_columns(select)
    return joined


def semi_join(big_ds, keys_ds, on: str, keys_on: str | None = None,
              broadcast_limit_rows: int = 2_000_000,
              broadcast_limit_bytes: int = 256 << 20,
              num_partitions: int = 8):
    """Semi-join: keep big-side rows whose ``on`` value appears in the key
    Dataset. Strategy-gated like :func:`auto_join`: a small key side is
    distinct-ed, collected ONCE into a sorted numpy array, broadcast via
    ``ray.put`` (resolved once per worker, never rebuilt per batch), and
    applied as a streaming searchsorted filter; a key side past the row/byte
    gates falls back to a distinct + partitioned hash join — never an
    unbounded driver collect."""
    import numpy as np
    import ray

    keys_on = keys_on or on
    keys_ds = keys_ds.materialize()
    if keys_ds.count() == 0:  # empty key set (schema may be lost): keep nothing
        return big_ds.map_batches(lambda df: df.iloc[0:0],
                                  batch_format="pandas")
    if (keys_ds.count() <= broadcast_limit_rows
            and (keys_ds.size_bytes() or 0) <= broadcast_limit_bytes):
        kdf = keys_ds.to_pandas()
        arr = np.unique(kdf[keys_on].to_numpy())
        kref = ray.put(arr)

        def filt(df: pd.DataFrame) -> pd.DataFrame:
            if on not in df.columns:  # column-less empty block (Ray 2.49)
                return df
            a = _resolve(kref)
            v = df[on].to_numpy()
            pos = np.minimum(np.searchsorted(a, v), len(a) - 1)
            return df[a[pos] == v]

        return big_ds.map_batches(filt, batch_format="pandas")
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_distinct

    keys = _drop_schemaless_blocks(hash_distinct(keys_ds.map_batches(
        _project_rename(keys_on, on), batch_format="pandas"),
        [on], num_partitions))
    big = _drop_schemaless_blocks(big_ds)
    if big is None or keys is None:  # nothing joinable → keep nothing
        return big_ds.map_batches(lambda df: df.iloc[0:0],
                                  batch_format="pandas")
    return big.join(keys, join_type="inner", num_partitions=num_partitions,
                    on=(on,))


def _drop_schemaless_blocks(ds):
    """Drop Ray 2.49's schema-less zero-row blocks before a ``Dataset.join``
    — Acero rejects any block missing the key field ("No match ... for key
    field reference"). Selection is by the driver-held block METADATA
    (num_rows / schema names) — no block is ever fetched, so the big side of
    a partitioned join stays in the object store. A dataset with no such
    blocks passes through untouched (zero cost beyond the materialize the
    join implies); one with ONLY empty blocks returns None (nothing
    joinable). Schema-less empties only arise from pandas-UDF outputs, so
    the rebuilt dataset is reconstructed from pandas block refs."""
    import ray.data as rd

    ds = ds.materialize()
    pairs = [(r, m) for b in ds.iter_internal_ref_bundles()
             for r, m in b.blocks]
    schemaless = [m for _, m in pairs
                  if m.num_rows == 0
                  and not getattr(getattr(m, "schema", None), "names", None)]
    if not schemaless:
        return ds
    keep = [r for r, m in pairs if m.num_rows]
    if not keep:
        return None
    return rd.from_pandas_refs(keep)


def _project_rename(src: str, dst: str):
    """Project one column under a new name, tolerating Ray 2.49's
    COLUMN-LESS empty blocks (a zero-row pandas block loses its schema;
    selecting from it would KeyError inside the task)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        if src not in df.columns:  # column-less empty block
            return pd.DataFrame({dst: pd.Series(dtype=object)})
        return df[[src]].rename(columns={src: dst})
    return f


def skew_join(left, right, on: str, how: str = "inner",
              hot_min_rows: int = 100_000, candidates_per_batch: int = 8,
              num_partitions: int = 8,
              broadcast_limit_rows: int = 2_000_000,
              broadcast_limit_bytes: int = 256 << 20):
    """Skew-handling equi-join (the Spark AQE skew strategy the reference
    leans on, ``utils/spark_utils.py:31-33``, as an explicit operator):
    keys hot enough to straggle a partitioned hash join are joined
    broadcast-side with NO shuffle; only the cold remainder shuffles.

    Hot-key detection is a bounded heavy-hitter pre-pass: each batch emits
    its ``candidates_per_batch`` most frequent keys with their partial
    counts (a true heavy hitter tops some batch's local top-k; the exchange
    moves ≤ k rows per batch, never the key space), a combiner sum totals
    them, and keys with ≥ ``hot_min_rows`` observed rows are hot. The hot
    slice of ``right`` must fit the broadcast gates (hot keys are few and
    dimension-sided by construction; a violation raises rather than
    silently collecting). ``how`` ∈ {"inner", "left"}."""
    import ray

    assert how in ("inner", "left"), how
    left = left.materialize()

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(on, sort=False).size().nlargest(candidates_per_batch)
        return pd.DataFrame({on: c.index.to_numpy(), "_n": c.to_numpy()})

    from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

    cand = hash_agg(left.map_batches(local_top, batch_format="pandas"),
                    on, {"_n": ("_n", "sum")}, num_partitions).to_pandas()
    hot = np.sort(cand.loc[cand["_n"] >= hot_min_rows, on].to_numpy())

    if not len(hot):
        return auto_join(left, right, on=[on], how="inner" if how == "inner"
                         else "left_outer", num_partitions=num_partitions,
                         broadcast_limit_rows=broadcast_limit_rows,
                         broadcast_limit_bytes=broadcast_limit_bytes)

    href = ray.put(hot)

    def split(keep_hot: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            a = _resolve(href)
            v = df[on].to_numpy()
            pos = np.minimum(np.searchsorted(a, v), len(a) - 1)
            m = a[pos] == v
            return df[m if keep_hot else ~m]
        return f

    right = right.materialize()
    rhot_ds = right.map_batches(split(True), batch_format="pandas").materialize()
    assert (rhot_ds.count() <= broadcast_limit_rows
            and (rhot_ds.size_bytes() or 0) <= broadcast_limit_bytes), \
        "hot slice of the right side exceeds the broadcast gates"
    rhot = rhot_ds.to_pandas()

    hot_out = broadcast_join(
        left.map_batches(split(True), batch_format="pandas"), rhot, on=[on],
        how="inner" if how == "inner" else "left")
    # cold path joins against the COLD right slice only — re-shuffling the
    # hot rows (already broadcast above) would rebuild the exact skewed
    # build partition this operator exists to avoid, for zero matches.
    cold_out = left.map_batches(split(False), batch_format="pandas").join(
        right.map_batches(split(False), batch_format="pandas"),
        join_type="inner" if how == "inner" else "left_outer",
        num_partitions=num_partitions, on=(on,))
    return hot_out.union(cold_out)


def anti_join(big_ds, keys_ds, on: str, keys_on: str | None = None,
              broadcast_limit_rows: int = 2_000_000,
              broadcast_limit_bytes: int = 256 << 20,
              num_partitions: int = 8):
    """Anti-join: keep big-side rows whose ``on`` value does NOT appear in
    the key Dataset — :func:`semi_join`'s complement, same strategy gates:
    a small key side broadcasts as a sorted array and filters streamingly;
    past the gates it falls back to Ray's partitioned ``left_anti`` hash
    join. Never an unbounded driver collect."""
    import numpy as np
    import ray

    keys_on = keys_on or on
    keys_ds = keys_ds.materialize()
    if keys_ds.count() == 0:  # empty key set: the complement keeps everything
        return big_ds
    if (keys_ds.count() <= broadcast_limit_rows
            and (keys_ds.size_bytes() or 0) <= broadcast_limit_bytes):
        kdf = keys_ds.to_pandas()
        arr = np.unique(kdf[keys_on].to_numpy())
        kref = ray.put(arr)

        def filt(df: pd.DataFrame) -> pd.DataFrame:
            if on not in df.columns:  # column-less empty block (Ray 2.49)
                return df
            a = _resolve(kref)
            v = df[on].to_numpy()
            pos = np.minimum(np.searchsorted(a, v), len(a) - 1)
            return df[a[pos] != v]

        return big_ds.map_batches(filt, batch_format="pandas")
    from maritime_activity_reports_cdc_ray.functions.dedup import hash_distinct

    keys = _drop_schemaless_blocks(hash_distinct(keys_ds.map_batches(
        _project_rename(keys_on, on), batch_format="pandas"),
        [on], num_partitions))
    big = _drop_schemaless_blocks(big_ds)
    if big is None:  # no joinable big rows → complement is empty too
        return big_ds.map_batches(lambda df: df.iloc[0:0],
                                  batch_format="pandas")
    if keys is None:  # no key rows → the complement keeps everything
        return big
    return big.join(keys, join_type="left_anti",
                    num_partitions=num_partitions, on=(on,))


def asof_join(left, right, by: str, on: str, tie_cols: list[str] | None = None,
              direction: str = "backward", num_partitions: int = 32):
    """ASOF join — each left row picks the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``on`` value within the
    same ``by`` key. Ray Data has no native asof; this is the composition the
    engine uses for one: tag sides → union → hash-partition on ``by`` → ONE
    vectorized ``pandas.merge_asof`` per partition (never a dispatch per key).
    The shuffle moves each side once; at 100 TB both sides stream through the
    same exchange a groupby pays.

    Ties on (``by``, ``on``) in the right side resolve to the LAST row after
    a stable sort by (``on``, *tie_cols) — i.e. the max of ``tie_cols`` —
    making the result deterministic and SQL-reproducible (dedup the right
    side to ``MAX(tie)`` per (by, on) in the oracle)."""
    import numpy as np

    lnames = list(left.schema().names)
    rschema = right.schema()
    rnames = list(rschema.names)
    all_cols = list(dict.fromkeys(lnames + rnames))
    tie = list(tie_cols or [])
    # typed fallbacks for partitions whose right side is empty: mirror what
    # merge_asof emits for unmatched rows (NaN / NaT / None) so every
    # partition produces the same Arrow block schema — object-dtype None
    # columns would make cross-partition schema unification unstable
    import pyarrow as _pa

    def _null_for(pa_type):
        if _pa.types.is_integer(pa_type) or _pa.types.is_floating(pa_type):
            return float("nan")
        if _pa.types.is_timestamp(pa_type) or _pa.types.is_date(pa_type):
            return pd.NaT
        return None

    rnulls = {n: _null_for(t) for n, t in zip(rschema.names, rschema.types)}

    def tag(side, names):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in all_cols:
                if c not in df.columns:
                    df[c] = None
            df["_side"] = np.int8(side)
            return df[all_cols + ["_side"]]

        return f

    both = (left.map_batches(tag(0, lnames), batch_format="pandas")
            .union(right.map_batches(tag(1, rnames), batch_format="pandas")))

    from maritime_activity_reports_cdc_ray.functions.window import _per_key_apply

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0][lnames].infer_objects()
        rf = g[g["_side"] == 1][rnames].infer_objects()
        lf = lf.sort_values([on], kind="mergesort")
        rf = rf.sort_values([on] + tie, kind="mergesort")
        if len(rf) == 0:
            out = lf.copy()
            for c in rnames:
                if c not in (by, on):
                    out[c] = rnulls[c]
            return out
        return pd.merge_asof(lf, rf, on=on, by=by, direction=direction,
                             allow_exact_matches=True)

    return _per_key_apply(both, [by], kernel, num_partitions)


def range_join_broadcast(big_ds, bands: pd.DataFrame, value_col: str,
                         lo_col: str, hi_col: str, how: str = "inner"):
    """Range/interval join — each big-side row matches every band row whose
    ``[lo, hi)`` interval contains its ``value``. Ray Data has no range join;
    the 100 TB shape for a small band side is a broadcast (``ray.put`` once,
    resolved once per worker) + one vectorized mask per band inside
    ``map_batches`` — no shuffle, skew-immune, O(rows × bands) with tiny
    constant. Overlapping bands fan out (row duplicated per match);
    ``how="left"`` keeps unmatched rows with null band columns."""
    import numpy as np
    import ray

    assert how in ("inner", "left"), how
    band_cols = [c for c in bands.columns if c not in (lo_col, hi_col)]
    sref = ray.put(bands.reset_index(drop=True))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        b = _resolve(sref)
        v = df[value_col].to_numpy()
        outs = []
        matched = np.zeros(len(df), dtype=bool)
        for _i, row in b.iterrows():
            m = (v >= row[lo_col]) & (v < row[hi_col])
            if not m.any():
                continue
            matched |= m
            part = df[m].copy()
            for c in band_cols:
                part[c] = row[c]
            outs.append(part)
        if how == "left" and not matched.all():
            part = df[~matched].copy()
            for c in band_cols:
                part[c] = None
            outs.append(part)
        if not outs:
            out = df.head(0).copy()
            for c in band_cols:
                out[c] = None
            return out
        return pd.concat(outs, ignore_index=True)

    return big_ds.map_batches(match, batch_format="pandas")
