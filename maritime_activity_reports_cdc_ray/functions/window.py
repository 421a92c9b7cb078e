"""Per-key ordered (windowed) computation over Ray datasets.

Reference analogues (SURVEY.md §2.3):

- W1 lag/lead enrichment — ``Window.partitionBy(imo).orderBy(ts)`` + lag/lead
  deltas (``silver/cdf_processor.py:140-204``),
- W2 transition detection (``gold/cdf_processor.py:138-157``),
- W3 latest-record-per-key argmax (``silver/table_setup.py:298-324``),
- W4 sequence numbering + adjacent pairing (``gold/materialized_views.py:254-292``),
- W5 rank within partition (``gold/table_setup.py:466-467``).

Execution shape: hash-partition the key into ``num_partitions`` groups, then
ONE ``map_groups`` call per partition whose kernel is vectorized across every
key in the partition via pandas ``groupby(...).shift()/diff()/rank()/tail()``.
A naive ``groupby(key).map_groups`` would pay one Python dispatch per key
(~ms each — hours at millions of keys); this shape does the identical shuffle
with P dispatches total. ``latest_per_key`` additionally pre-reduces inside
``map_batches`` (one candidate row per key per batch) so the shuffle moves
candidates, not the full table — the combiner pattern for aggregation at
scale.
"""

from __future__ import annotations

import pandas as pd

from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part


def _per_key_apply(ds, keys: list[str], kernel, num_partitions: int = 32):
    """Hash-partition on ``keys`` → one vectorized ``kernel`` call per
    partition. ``kernel`` receives a partition DataFrame (``_part`` already
    dropped) holding every row of each of its keys."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = _hash_part(df, keys, num_partitions)
        return df

    def part(g: pd.DataFrame) -> pd.DataFrame:
        return kernel(g.drop(columns=["_part"]))

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(part, batch_format="pandas"))


def per_key_lag(ds, key: str, order: list[str], lag_cols: dict[str, str],
                num_partitions: int = 32):
    """Append ``prev_<col>`` columns (lag 1) per key ordered by ``order``.

    ``lag_cols`` maps source column → output column name.
    """

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        gb = g.groupby(key, sort=False)
        for src, dst in lag_cols.items():
            g[dst] = gb[src].shift(1)
        return g

    return _per_key_apply(ds, [key], kernel, num_partitions)


def latest_per_key(ds, key: str | list[str], order: list[str],
                   num_partitions: int = 32):
    """Argmax per key (LWW view): the row with the greatest ``order`` tuple.
    Two-stage: per-batch reduce (combiner) → per-partition reduce after the
    shuffle."""
    keys = [key] if isinstance(key, str) else list(key)

    def reduce_local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(keys + order, kind="mergesort")
        return df.groupby(keys, as_index=False, sort=False).tail(1)

    pre = ds.map_batches(reduce_local, batch_format="pandas")
    return _per_key_apply(pre, keys, reduce_local, num_partitions)


def transitions(ds, key: str, order: list[str], col: str,
                num_partitions: int = 32):
    """Rows where ``col`` differs from the previous row of the same key
    (zone-entry analogue). Adds ``prev_<col>`` and keeps only transitions;
    the first row of a key counts as a transition from null."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        g[f"prev_{col}"] = g.groupby(key, sort=False)[col].shift(1)
        return g[(g[col] != g[f"prev_{col}"]) | g[f"prev_{col}"].isna()]

    return _per_key_apply(ds, [key], kernel, num_partitions)


def scd2_view(ds, key: str, order: str, num_partitions: int = 32):
    """Turn an event log into SCD2 version rows: ``valid_from`` = own order
    value, ``valid_to`` = next row's (null for the open version),
    ``is_current`` flag (reference: SCD2 columns bronze/table_setup.py:113-116)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order], kind="mergesort")
        g["valid_from"] = g[order]
        g["valid_to"] = g.groupby(key, sort=False)[order].shift(-1)
        g["is_current"] = g["valid_to"].isna()
        return g

    return _per_key_apply(ds, [key], kernel, num_partitions)


def sessionize(ds, key: str, ts_col: str, gap_seconds: float,
               num_partitions: int = 32):
    """Assign per-key session ids: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``. Session id = cumulative count of
    session starts within the key (1-based)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        gap = g.groupby(key, sort=False)[ts_col].diff().dt.total_seconds()
        starts = gap.isna() | (gap > gap_seconds)
        g["session_id"] = starts.groupby(g[key], sort=False).cumsum().astype("int64")
        return g

    return _per_key_apply(ds, [key], kernel, num_partitions)


def rank_within(ds, partition: str, order_col: str, descending: bool = True,
                rank_col: str = "rnk", num_partitions: int = 32):
    """SQL RANK() OVER (PARTITION BY partition ORDER BY order_col) — ties get
    the same rank, next rank skips (competition ranking)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition, order_col], kind="mergesort")
        g[rank_col] = (
            g.groupby(partition, sort=False)[order_col]
            .rank(method="min", ascending=not descending).astype("int64")
        )
        return g

    return _per_key_apply(ds, [partition], kernel, num_partitions)


def adjacent_pairs(ds, key: str, order: list[str], cols: list[str],
                   num_partitions: int = 32):
    """Pair each row with its predecessor per key (journey pairing, W4):
    emits rows 2..n of each key with ``prev_<col>`` columns — the map_groups
    translation of the reference's ROW_NUMBER + self-join on seq = seq+1
    (gold/materialized_views.py:254-292), computed in one pass."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        gb = g.groupby(key, sort=False)
        for c in cols:
            g[f"prev_{c}"] = gb[c].shift(1)
        return g[gb.cumcount() > 0]

    return _per_key_apply(ds, [key], kernel, num_partitions)


def global_rank(ds, order_col: str, descending: bool = True, rank_col: str = "rnk"):
    """Global competition rank (W5) — DISTRIBUTED: global sort → per-block
    rank with sorted-block offsets. The driver sees only per-block metadata
    (count, first/last value, tail-run length) to thread tie runs across
    block boundaries; row data never leaves the object store, so this is
    safe to point at a fact table (unlike a sort + driver collect)."""
    import numpy as np
    import ray
    import ray.data as rd

    sorted_ds = ds.sort(order_col, descending=descending).materialize()
    refs = sorted_ds.to_pandas_refs()

    @ray.remote
    def block_meta(df: pd.DataFrame):
        if not len(df):
            return (0, None, None, 0)
        v = df[order_col].to_numpy()
        tail_run = int((v == v[-1])[::-1].cumprod().sum())
        return (len(df), v[0], v[-1], tail_run)

    metas = ray.get([block_meta.remote(r) for r in refs])
    # walk blocks: track the value-run in progress at each block boundary so
    # a tie spanning blocks keeps the run's first rank (competition ranking)
    ctx = []  # per block: (offset, prev_val, prev_run_start_rank)
    total, run_val, run_start = 0, None, None
    for cnt, first, last, tail_run in metas:
        ctx.append((total, run_val, run_start))
        if not cnt:
            continue
        if run_val is not None and first == run_val and tail_run == cnt:
            pass  # the whole block continues the boundary run (sorted ⇒
            # first == last == run_val), keeping its original start rank
        else:
            run_start = total + (cnt - tail_run) + 1
            run_val = last
        total += cnt

    asc = not descending

    @ray.remote
    def rank_block(df: pd.DataFrame, offset: int, prev_val, prev_start):
        df = df.copy()
        if not len(df):
            df[rank_col] = pd.Series(dtype="int64")
            return df
        r = (df[order_col].rank(method="min", ascending=asc)
             .astype("int64").to_numpy() + offset)
        if prev_val is not None:
            head = df[order_col].to_numpy() == prev_val  # sorted → head run
            r = np.where(head, prev_start, r)
        df[rank_col] = r.astype("int64")
        return df

    out = [rank_block.remote(r, off, pv, ps)
           for r, (off, pv, ps) in zip(refs, ctx)]
    return rd.from_pandas_refs(out)



def rolling_agg(ds, key: str, order: list[str], value_col: str,
                window_rows: int, num_partitions: int = 32,
                running_col: str = "running_sum",
                rolling_col: str = "rolling_sum",
                n_col: str = "rolling_n"):
    """Per-key running + rolling (moving-frame) SUM — the SQL frames

    - ``SUM(v) OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
      PRECEDING)`` → ``running_col``,
    - ``SUM(v) OVER (... ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT
      ROW)`` → ``rolling_col`` (+ ``n_col`` = the frame's row count, so a
      caller can derive an exact quantized moving average).

    Streaming-analytics staple the lag/lead + hopping-window family lacked
    (reference analogue: the cumulative-distance / rolling-average windows of
    ``silver/cdf_processor.py:140-204``). ``value_col`` must be integral
    (quantize currency to cents first): integer cumsum is exact at ANY
    summation order, so the result is bit-identical to any SQL engine —
    float rolling sums would diverge in ulps between engines.

    Shape: the standard ``_per_key_apply`` hash-partition → one vectorized
    kernel per partition. The rolling frame is two cumsum reads
    (``cs[i] - cs[i-w]``), never a per-row window loop."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        gb = g.groupby(key, sort=False)
        cs = gb[value_col].cumsum()
        g[running_col] = cs
        # frame sum = cumsum minus the cumsum w rows back (0 before the key
        # has w rows) — per-key shift keeps frames from crossing keys
        prev = (cs.groupby(g[key], sort=False).shift(window_rows)
                .fillna(0).astype(cs.dtype))
        g[rolling_col] = cs - prev
        g[n_col] = (gb.cumcount() + 1).clip(upper=window_rows).astype("int64")
        return g

    return _per_key_apply(ds, [key], kernel, num_partitions)


def ntile_within(ds, partition: str, order_col: str, id_col: str, n: int,
                 descending: bool = True, num_partitions: int = 32,
                 out_col: str = "ntile"):
    """SQL ``NTILE(n) OVER (PARTITION BY p ORDER BY o [DESC], id)`` — equal
    buckets with the remainder spread over the FIRST buckets (bucket sizes
    ``q+1`` for the first ``r``, ``q`` after, where ``q, r = divmod(cnt, n)``)
    — the exact ANSI rule, vectorized: no per-key dispatch, no bucket loop."""
    import numpy as np

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition, order_col, id_col],
                          ascending=[True, not descending, True],
                          kind="mergesort")
        gb = g.groupby(partition, sort=False)
        rn = gb.cumcount().to_numpy()  # 0-based row number within partition
        cnt = gb[order_col].transform("size").to_numpy()
        q, r = cnt // n, cnt % n
        big = r * (q + 1)  # rows covered by the (q+1)-sized head buckets
        in_head = rn < big
        head = rn // np.maximum(q + 1, 1)
        tail = r + (rn - big) // np.maximum(q, 1)
        g[out_col] = np.where(in_head, head, tail).astype("int64") + 1
        return g

    return _per_key_apply(ds, [partition], kernel, num_partitions)


def topk_per_group(ds, partition: str, order_col: str, id_col: str, k: int,
                   descending: bool = True, num_partitions: int = 32,
                   rn_col: str = "rn"):
    """SQL ``ROW_NUMBER() OVER (PARTITION BY p ORDER BY o [DESC], id) <= k``
    — group-balanced top-k selection (curation: best docs per language /
    source cap). Same partition-local kernel shape as rank_within: ONE
    vectorized call per hash partition, never a dispatch per key."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition, order_col, id_col],
                          ascending=[True, not descending, True],
                          kind="mergesort")
        g[rn_col] = (g.groupby(partition, sort=False).cumcount() + 1).astype("int64")
        return g[g[rn_col] <= k]

    return _per_key_apply(ds, [partition], kernel, num_partitions)


def window_expand_hopping(ds, ts_col: str, size_us: int, hop_us: int,
                          out_col: str = "window_start_us"):
    """Hopping/sliding-window expansion (streaming windowed-aggregate
    primitive): each row is replicated into every window that contains it —
    ``size_us / hop_us`` copies, stamped with the window's start (epoch µs,
    int64). ``hop == size`` degenerates to a tumbling window. A downstream
    ``groupby(out_col).aggregate(...)`` then computes the windowed aggregate;
    the expansion is a pure vectorized per-batch map (no state, no shuffle —
    the only exchange is the aggregate's own)."""
    assert size_us % hop_us == 0, "hop must divide size"
    k = size_us // hop_us

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].astype("int64")
        base = (ts // hop_us) * hop_us
        outs = []
        for i in range(k):
            w = df.copy()
            w[out_col] = base - i * hop_us
            outs.append(w)
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(expand, batch_format="pandas")
