"""Dataset-level statistics / quality reports.

Reference analogues: ingestion stats (``bronze/cdc_ingestion.py:289-330``),
quality report (``utils/data_quality.py:167-253``), silver quality stats
(``silver/streaming_processor.py:306-340``) — all expressed as Ray aggregates
with conditional counts pre-computed as 0/1 columns inside ``map_batches``
(never a collect + driver loop)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def ingestion_stats(ds, op_col: str = "cdc_operation", score_col: str = "data_quality_score"):
    """Global ingest metrics: row count, per-op conditional counts, avg score."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    def flags(t: pa.Table) -> pa.Table:
        for op in ("upsert", "delete"):
            t = t.append_column(f"is_{op}", pc.cast(pc.equal(t.column(op_col), op), pa.int64()))
        return t

    out = (
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(
            Count(alias_name="rows"),
            Sum("is_upsert", alias_name="upserts"),
            Sum("is_delete", alias_name="deletes"),
            Mean(score_col, alias_name="avg_quality_score"),
            Min("commit", alias_name="min_commit"),
            Max("commit", alias_name="max_commit"),
        )
    )
    return out


def quality_report(ds, score_col: str, category_col: str, fields: list[str]):
    """Score distribution + per-category counts + per-field completeness %."""
    from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

    agg = ds.aggregate(
        Count(alias_name="rows"),
        Mean(score_col, alias_name="avg_score"),
        Min(score_col, alias_name="min_score"),
        Max(score_col, alias_name="max_score"),
        Std(score_col, alias_name="std_score"),
    )
    by_cat = ds.groupby(category_col).count().to_pandas()

    def nn_flags(t: pa.Table) -> pa.Table:
        out = {f: pc.cast(pc.is_valid(t.column(f)), pa.int64()) for f in fields}
        out["one"] = pa.array([1] * t.num_rows, pa.int64())
        return pa.table(out)

    sums = ds.map_batches(nn_flags, batch_format="pyarrow").aggregate(
        *[Sum(f, alias_name=f"nn_{f}") for f in fields], Sum("one", alias_name="n")
    )
    n = max(1, sums["n"])
    completeness = {f: sums[f"nn_{f}"] / n for f in fields}
    return {"summary": agg, "by_category": by_cat, "completeness": completeness}


def grouped_percentiles(ds, key, value_col: str, qs: list[float],
                        count_alias: str = "n"):
    """Per-group EXACT discrete percentiles (PERCENTILE_DISC semantics: the
    smallest value whose cumulative distribution ≥ q, i.e. sorted index
    ``ceil(q·n) - 1``). Reference analogue: the exact ``PERCENTILE_CONT``
    median inside port metrics (``gold/cdf_processor.py:350-414``, SURVEY.md
    A5) — exact percentiles need the whole group, which is fine because groups
    are per-key; the shuffle is the groupby itself.

    Picking an element (no interpolation arithmetic) keeps the result
    bit-identical to any SQL engine's PERCENTILE_DISC on the same data.

    Shape: hash-partition the key → ONE vectorized kernel per partition
    (sorted segments + reduceat index math — no per-key Python dispatch)."""
    from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

    keys = [key] if isinstance(key, str) else list(key)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keys + [value_col]].copy()
        df["_part"] = _hash_part(df, keys, 16)
        return df

    def pct(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [value_col], kind="mergesort")
        kf = g[keys[0]].astype(str) if len(keys) == 1 else \
            g[keys].astype(str).agg("\x1f".join, axis=1)
        codes, starts = np.unique(kf.to_numpy(), return_index=True)
        starts = np.sort(starts)
        counts = np.diff(np.append(starts, len(g)))
        v = g[value_col].to_numpy(dtype=np.float64)
        out = {c: g[c].to_numpy()[starts] for c in keys}
        out[count_alias] = counts.astype("int64")
        for q in qs:
            idx = starts + np.maximum(0, np.ceil(q * counts).astype(np.int64) - 1)
            out[f"p{int(q * 100)}"] = v[idx]
        return pd.DataFrame(out)

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(
                lambda g: pct(g.drop(columns=["_part"])), batch_format="pandas"))


#: guard for the documented small-side driver reductions below — a rollup /
#: pivot whose GROUP CARDINALITY exceeds this belongs in a distributed
#: re-reduce, not a driver frame (the aggregation itself already ran
#: distributed; only the group-cardinality result lands here)
GROUP_RESULT_DRIVER_LIMIT = 2_000_000


def _collect_group_result(ds, op: str) -> pd.DataFrame:
    """Collect a distributed group-cardinality result with the driver-size
    contract ENFORCED: count first (blocks stay in the object store), fail
    loudly past :data:`GROUP_RESULT_DRIVER_LIMIT` instead of silently OOMing
    the driver on a high-cardinality key set."""
    ds = ds.materialize()
    n = ds.count()
    if n > GROUP_RESULT_DRIVER_LIMIT:
        raise ValueError(
            f"{op}: {n} groups exceed the driver-side reshape contract "
            f"({GROUP_RESULT_DRIVER_LIMIT}); re-aggregate on a coarser key "
            "or keep the result long (hash_agg) instead of reshaping wide")
    return ds.to_pandas()


def group_count_small(ds, key: str, alias: str = "n") -> pd.DataFrame:
    """COUNT(*) GROUP BY a LOW-CARDINALITY key with NO exchange at all:
    per-batch partial counts (combiner) → driver reduce.

    Contract (same small-side shape as ``rollup_agg``): the driver holds
    ≤ |batches| × |distinct keys| partial rows — right for label/category/
    band rollups (|keys| ≤ dozens) where a shuffle's barrier costs more than
    the whole aggregation; use :func:`hash_agg` for high-cardinality keys.
    A NULL key is a REAL group (SQL GROUP BY semantics — the rollup_agg
    sentinel contract), not silently dropped."""
    _SENT = "\x00\x00__null__"

    def local(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key]
        if k.isna().any():
            df = df.assign(**{key: k.astype(object).where(k.notna(), _SENT)})
        return df.groupby(key, as_index=False, sort=False).size() \
            .rename(columns={"size": alias})

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    if not len(parts):
        return parts
    out = parts.groupby(key, as_index=False, sort=False)[alias].sum()
    out[key] = out[key].where(out[key] != _SENT, None)
    return out


def hash_agg(ds, keys, aggs: dict, num_partitions: int = 16):
    """Grouped aggregation with a REAL global reduce: per-batch partial pandas
    agg (combiner — shrinks the shuffle to ≤ |batches|×|keys-in-batch| rows)
    → hash partition on the keys → ONE vectorized re-aggregation per partition.

    ``aggs`` maps output alias → (column, fn) with fn ∈ {sum, max, min, count}.
    Unlike a per-batch-only groupby (correct only while one hash partition ==
    one batch), this is correct under ANY batching/blocking — the partials are
    re-reduced globally. Count re-reduces as sum; sum/max/min are associative.

    NULL group keys are DROPPED (pandas groupby semantics — the contract
    the IVM views document), unlike SQL GROUP BY / Ray's native aggregate,
    which keep a NULL group. When SQL parity over nullable keys is needed,
    sentinel NULLs before the call and restore after — the
    ``rollup_agg`` / ``_lang_breakdown`` / ``StreamingWindowAgg`` pattern.

    Exchange choice: the sort-based groupby, deliberately. The alternative —
    Ray's hash shuffle via ``repartition(keys=['_part'])`` in
    ``hash_shuffle_ctx`` — was measured SLOWER on a 35M-row partial set
    (18.0 s vs 11.0 s end-to-end on the jaccard-join pipeline at sf0.1:
    aggregator-actor spin-up plus per-row hashing beat the sort only in the
    merge engine's long-lived replay loop, and a plan's DataContext seals at
    its ROOT dataset, which forces an extra materialize+re-root barrier on
    any already-built input)."""
    from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

    keys = [keys] if isinstance(keys, str) else list(keys)
    partial_spec = {a: (c, "size" if f == "count" else f) for a, (c, f) in aggs.items()}
    final_spec = {a: (a, "sum" if f in ("sum", "count") else f) for a, (_, f) in aggs.items()}

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) and not set(keys) <= set(df.columns):
            return df  # schema-less empty block (Ray 2.49): no groups
        d = df.groupby(keys, as_index=False, sort=False).agg(**{
            a: pd.NamedAgg(column=c, aggfunc=f) for a, (c, f) in partial_spec.items()})
        d["_part"] = _hash_part(d, keys, num_partitions)
        return d

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) and not set(keys) <= set(g.columns):
            return g  # schema-less empty block through the hash exchange
        return g.groupby(keys, as_index=False, sort=False).agg(**{
            a: pd.NamedAgg(column=c, aggfunc=f) for a, (c, f) in final_spec.items()})

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(combine, batch_format="pandas"))


def grouped_mode(ds, key, value_col: str, out_col: str = "mode",
                 count_col: str | None = None, num_partitions: int = 16):
    """Per-key MODE (most frequent value, smallest-value tie-break) — the
    SQL ``arg_max``-over-counts / ``ROW_NUMBER() OVER (ORDER BY COUNT(*)
    DESC, value)`` idiom, combiner-first: per-batch (key, value) partial
    counts shrink the exchange to distinct pairs, the hash partition
    co-locates each key's pairs, and ONE vectorized sort+head per partition
    picks the winner. Returns one row per key (+ the winning count when
    ``count_col`` is set). Deterministic at any batching/parallelism."""
    from maritime_activity_reports_cdc_ray.functions.dedup import _hash_part

    keys = [key] if isinstance(key, str) else list(key)
    pair = keys + [value_col]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(pair, as_index=False, sort=False).agg(
            _n=pd.NamedAgg(column=value_col, aggfunc="size"))
        d["_part"] = _hash_part(d, keys, num_partitions)
        return d

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(pair, as_index=False, sort=False)["_n"].sum()
        t = t.sort_values(keys + ["_n", value_col],
                          ascending=[True] * len(keys) + [False, True],
                          kind="mergesort")
        w = t.groupby(keys, as_index=False, sort=False).head(1)
        w = w.rename(columns={value_col: out_col})
        if count_col is not None:
            w[count_col] = w["_n"].astype("int64")
        return w.drop(columns=["_n"])

    return (ds.map_batches(local, batch_format="pandas")
            .groupby("_part").map_groups(
                lambda g: pick(g.drop(columns=["_part"])),
                batch_format="pandas"))


def table_metrics(lake) -> pd.DataFrame:
    """Per-table fragment/row/byte counts from the manifest — free from
    lineage (reference: DESCRIBE DETAIL metrics, utils/spark_utils.py:111-150)."""
    m = lake.latest_manifest()
    rows = {}
    for f in m.fragments:
        d = rows.setdefault(f.kind, {"kind": f.kind, "fragments": 0, "rows": 0, "bytes": 0})
        d["fragments"] += 1
        d["rows"] += f.rows
        d["bytes"] += f.bytes
    return pd.DataFrame(list(rows.values()))


def hll_count_distinct(ds, cols: list[str], p: int = 12) -> float:
    """HyperLogLog approximate COUNT(DISTINCT cols) — the mergeable-sketch
    path for cardinalities where the exact ``hash_distinct`` shuffle is too
    expensive (per-key state never materializes; ~1.04/√m relative error,
    m = 2^p registers).

    Shape: each batch emits its non-zero (register, rho) partials → ONE tiny
    groupby-max merge (≤ m rows per batch move, not rows) → driver-side
    estimate with the standard bias/small-range corrections. Deterministic
    AND bit-reproducible by a SQL oracle: the row hash is ``md5_u64`` of the
    '\\x1f'-joined column strings (cached per batch on distinct tuples —
    cardinality work is dominated by repeats), register = top p bits,
    rho = leading zeros of the remaining 64-p bits + 1, and the register
    harmonic sum is computed as an EXACT integer (sum of 2^(K-rho)) so the
    final float division is a single identical IEEE op on both sides."""
    m = 1 << p
    width = 64 - p  # rho ∈ [1, width+1]

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"reg": pd.Series(dtype="int64"),
                                 "rho": pd.Series(dtype="int64")})
        reg, rho = _hll_reg_rho(df, cols, width)
        return (pd.DataFrame({"reg": reg, "rho": rho})
                .groupby("reg", as_index=False)["rho"].max())

    # hash_agg, not Ray's groupby().max(): the native path sorts every
    # partial row for <= m output registers (measured 9s vs <1s on the
    # grouped sketch at sf0.1)
    regs = hash_agg(ds.map_batches(partials, batch_format="pandas"),
                    "reg", {"rho_max": ("rho", "max")},
                    num_partitions=4).to_pandas()
    K = width + 1  # max rho → exact-integer scale for the harmonic sum
    S = 0
    nonzero = 0
    if len(regs):
        nonzero = len(regs)
        for r in regs["rho_max"].to_numpy():
            S += 1 << (K - int(r))
    zeros = m - nonzero
    S += zeros * (1 << K)  # empty registers contribute 2^-0 = 1 (scaled)
    alpha = 0.7213 / (1 + 1.079 / m)
    E = alpha * m * m * float(1 << K) / float(S)
    if E <= 2.5 * m and zeros:
        E = m * np.log(m / zeros)  # linear counting for the small range
    return float(E)


def _hll_reg_rho(df: pd.DataFrame, cols: list[str], width: int):
    """Vectorized (register, rho) per row: md5_u64 of the '\\x1f'-joined
    column strings (distinct-only hashing via md5_u64_array's factorize),
    then C-level shifts. ``rho`` needs bit_length(rest): rest < 2^52 is
    float64-exact so ``np.frexp`` reads it directly; wider rests (p < 12)
    split into 32-bit halves, each exact, no Python loop either way."""
    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    key = df[cols[0]].astype(str) if len(cols) == 1 else \
        df[list(cols)].astype(str).agg("\x1f".join, axis=1)
    h = md5_u64_array(key.to_numpy(dtype=object))
    reg = (h >> np.uint64(width)).astype(np.int64)  # top p bits
    rest = h & np.uint64((1 << width) - 1)
    if width <= 52:
        _, e = np.frexp(rest.astype(np.float64))
    else:
        hi = (rest >> np.uint64(32)).astype(np.float64)
        _, ehi = np.frexp(hi)
        _, elo = np.frexp((rest & np.uint64(0xFFFFFFFF)).astype(np.float64))
        e = np.where(hi > 0, ehi + 32, elo)
    rho = np.where(rest == 0, width + 1, width - e + 1).astype(np.int64)
    return reg, rho


def grouped_hll_count_distinct(ds, group_col: str, cols: list[str],
                               p: int = 12,
                               include_global: str | None = None) -> pd.DataFrame:
    """Per-group HyperLogLog approximate COUNT(DISTINCT cols) — the grouped
    form of :func:`hll_count_distinct` (distinct users per event type, the
    telemetry staple): identical hash/register/rho/estimate arithmetic, the
    partials just carry the group key, so the merge moves ≤ m non-zero
    registers PER GROUP per batch and no per-key distinct state ever
    materializes. Returns one (group, approx) row per group; bit-replayable
    by the same SQL the global sketch uses, GROUP BY'd.

    ``include_global``: when set (e.g. ``"*"``), an extra row under that
    label estimates the UNION of all groups by max-merging the group
    registers — the sketch's mergeability in action: the hash ignores the
    group, so the union's register is the max over groups, no second corpus
    pass. Identical to running the global sketch directly."""
    m = 1 << p
    width = 64 - p
    K = width + 1

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "reg": pd.Series(dtype="int64"),
                                 "rho": pd.Series(dtype="int64")})
        reg, rho = _hll_reg_rho(df, cols, width)
        return (pd.DataFrame({group_col: df[group_col].to_numpy(),
                              "reg": reg, "rho": rho})
                .groupby([group_col, "reg"], as_index=False)["rho"].max())

    regs = hash_agg(ds.map_batches(partials, batch_format="pandas"),
                    [group_col, "reg"], {"rho_max": ("rho", "max")},
                    num_partitions=8).to_pandas()
    alpha = 0.7213 / (1 + 1.079 / m)

    def estimate(sub: pd.DataFrame) -> float:
        S, nz = 0, len(sub)
        for r in sub["rho_max"].to_numpy():
            S += 1 << (K - int(r))
        zeros = m - nz
        S += zeros * (1 << K)
        E = alpha * m * m * float(1 << K) / float(S)
        if E <= 2.5 * m and zeros:
            E = m * np.log(m / zeros)
        return float(E)

    rows = [(g, estimate(sub))
            for g, sub in regs.groupby(group_col, sort=True)]
    if include_global is not None:
        merged = (regs.groupby("reg", as_index=False)["rho_max"].max())
        rows.append((include_global, estimate(merged)))
    return pd.DataFrame(rows, columns=[group_col, "approx"])


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy hitters)
# ---------------------------------------------------------------------------
def cms_sketch(ds, term_col: str = "term", d: int = 4, w: int = 1024,
               num_partitions: int = 16):
    """Count-Min sketch over a term stream — the mergeable heavy-hitter
    sketch for frequency estimation where exact per-term counts are too
    expensive to co-locate. All-integer, so merging is EXACTLY associative
    and a SQL oracle reproduces every register bit-for-bit.

    Shape: each batch groupbys its local term counts and scatter-adds them
    into ``d`` register rows (one bincount per row — C-level), emitting only
    the NON-ZERO (row, slot, cnt) partials; a combiner-first ``hash_agg``
    sums them into the global sparse register table (≤ d·w rows ever move).
    Row hash = ``md5_u64(f"{row}:{term}") % w`` — in SQL:
    ``('0x' || substr(md5(row || ':' || term), 1, 16))::UBIGINT % w``.

    Returns the sparse register Dataset with columns (row, slot, cnt)."""
    from maritime_activity_reports_cdc_ray.hashing import md5_u64_array

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"row": pd.Series(dtype="int64"),
                              "slot": pd.Series(dtype="int64"),
                              "cnt": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        tc = df.groupby(term_col, sort=False).size()
        terms = tc.index.to_numpy(dtype=object)
        cnts = tc.to_numpy(dtype=np.int64)
        rows, slots, vals = [], [], []
        for i in range(d):
            keyed = np.asarray([f"{i}:{t}" for t in terms], dtype=object)
            s = (md5_u64_array(keyed) % np.uint64(w)).astype(np.int64)
            reg = np.bincount(s, weights=cnts, minlength=w).astype(np.int64)
            nz = np.flatnonzero(reg)
            rows.append(np.full(len(nz), i, dtype=np.int64))
            slots.append(nz.astype(np.int64))
            vals.append(reg[nz])
        if not rows:
            return empty
        return pd.DataFrame({"row": np.concatenate(rows),
                             "slot": np.concatenate(slots),
                             "cnt": np.concatenate(vals)})

    return hash_agg(ds.map_batches(partials, batch_format="pandas"),
                    ["row", "slot"], {"cnt": ("cnt", "sum")}, num_partitions)


def cms_estimate(regs: pd.DataFrame, terms, d: int = 4, w: int = 1024) -> np.ndarray:
    """Point-estimate term frequencies from a (row, slot, cnt) register
    frame: min over the d registers each term hashes to (0 when the slot is
    empty). Driver-side over the QUERIED terms only (top-k sized)."""
    from maritime_activity_reports_cdc_ray.hashing import md5_u64

    lut = {(int(r), int(s)): int(c)
           for r, s, c in zip(regs["row"], regs["slot"], regs["cnt"])}
    out = np.empty(len(terms), dtype=np.int64)
    for j, t in enumerate(terms):
        out[j] = min(lut.get((i, md5_u64(f"{i}:{t}") % w), 0) for i in range(d))
    return out


# ---------------------------------------------------------------------------
# equi-width histogram sketch (mergeable approximate quantiles)
# ---------------------------------------------------------------------------
def histogram_quantile_sketch(ds, group_col: str, value_col: str,
                              lo: float = 0.0, hi: float = 512.0,
                              n_bins: int = 256, qs=(0.5, 0.9),
                              num_partitions: int = 16) -> pd.DataFrame:
    """Per-group approximate quantiles from a mergeable equi-width histogram
    — the streaming-sketch path next to ``grouped_percentiles``' exact
    element selection (which must co-locate every group's values; the sketch
    moves only ≤ groups×n_bins integer rows, error ≤ one bin width).

    Deterministic + SQL-reproducible by construction: bin = clip(floor(
    (v - lo)/width), 0, n_bins-1) (pick lo/hi so width is a dyadic float and
    the division is exact); estimate(q) = lo + width · (first bin whose
    cumulative count ≥ ceil(q·n)) — lower-edge rule, all-integer cumsum.
    The rank ceil is FLOAT on both sides: mirror ``np.ceil(q * n)`` in SQL
    as ``CEIL(0.5e0 * n)``, NOT ``CEIL(0.5 * n)`` — DuckDB parses a bare
    decimal literal as DECIMAL and its exact CEIL differs from the float
    one for qs like 0.07 (np.ceil(0.07*100) = 8, exact CEIL = 7).

    Shape: per-batch integer bin counts per group (combiner) → combiner-first
    ``hash_agg`` sum → the finished histogram (bounded by groups×n_bins) is
    collected and the quantile walk is driver-side arithmetic on counts."""
    width = (hi - lo) / n_bins

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)  # NULL/NaN values are skipped, matching the exact
        v = v[ok]          # twin (PERCENTILE_DISC ignores NULLs); without
        g = df[group_col].to_numpy()[ok]  # this, floor(NaN).astype(int64)
        # poisons the histogram with an INT64_MIN garbage bin
        b = np.clip(np.floor((v - lo) / width), 0, n_bins - 1).astype(np.int64)
        return (pd.DataFrame({group_col: g, "bin": b})
                .groupby([group_col, "bin"], sort=False).size()
                .reset_index(name="cnt"))

    regs = hash_agg(ds.map_batches(partials, batch_format="pandas"),
                    [group_col, "bin"], {"cnt": ("cnt", "sum")},
                    num_partitions).to_pandas()
    rows = []
    for grp, g in regs.groupby(group_col, sort=True):
        g = g.sort_values("bin")
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        bins = g["bin"].to_numpy()
        row = {group_col: grp}
        for q in qs:
            k = np.ceil(q * n)
            # round, not truncate: int(0.29*100) == 28
            row[f"approx_p{int(round(q * 100))}"] = (
                lo + width * float(bins[int(np.searchsorted(cum, k))]))
        rows.append(row)
    return pd.DataFrame(rows)


def rollup_agg(ds, keys: list[str], aggs: dict, num_partitions: int = 16):
    """SQL ``GROUP BY ROLLUP(keys)``: one result-row set per key prefix —
    finest grain, each coarser level, grand total — with rolled-up key
    columns NULL (the SQL convention).

    Scale shape: the corpus is scanned ONCE — a single combiner-first
    :func:`hash_agg` at the finest grain; every coarser level re-reduces the
    FINEST result (group-cardinality input, pandas on the driver — the same
    small-side contract as every rollup here). Re-reduction is exact because
    the agg set is associative: count re-reduces as sum; sum/max/min as
    themselves. ``aggs`` = {alias: (col, fn)} with fn in
    {sum, count, max, min}. Semantics pins: count = COUNT(*) (row count,
    nulls included); sum skips NULLs and an all-NULL group sums to 0
    (= SQL ``COALESCE(SUM(v), 0)``), pandas' convention. NULL GROUP KEYS
    are real groups (SQL GROUP BY semantics — pandas' dropna would silently
    drop their rows from every subtotal and the grand total): keys pass
    through a sentinel before the combiner and restore to None on output,
    so the result rows match DuckDB's ROLLUP output exactly (where, as in
    SQL, a data-NULL key row and a rolled-up row print identically)."""
    import pandas as pd

    _SENT = "\x00\x00__null__"

    def mask_nulls(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for k in keys:
            if df[k].isna().any():
                df[k] = df[k].astype(object).where(df[k].notna(), _SENT)
        return df

    finest = _collect_group_result(
        hash_agg(ds.map_batches(mask_nulls, batch_format="pandas"),
                 keys, aggs, num_partitions=num_partitions), "rollup_agg")
    if "_part" in finest.columns:
        finest = finest.drop(columns=["_part"])
    refn = {a: (a, "sum" if f in ("sum", "count") else f)
            for a, (_, f) in aggs.items()}
    levels = [finest]
    for k in range(len(keys) - 1, -1, -1):
        sub = keys[:k]
        if sub:
            lv = finest.groupby(sub, as_index=False, sort=False).agg(
                **{a: pd.NamedAgg(column=c, aggfunc=f)
                   for a, (c, f) in refn.items()})
        else:
            lv = pd.DataFrame([{a: (finest[c].sum()
                                    if f in ("sum",) else
                                    finest[c].max() if f == "max" else
                                    finest[c].min())
                                for a, (c, f) in refn.items()}])
        for c in keys[k:]:
            lv[c] = None
        levels.append(lv[keys + list(aggs)])
    out = pd.concat([lv[keys + list(aggs)] for lv in levels],
                    ignore_index=True)
    for k in keys:  # sentinel back to a real NULL group key
        out[k] = out[k].where(out[k] != _SENT, None)
    return out.sort_values(keys, na_position="last").reset_index(drop=True)


def pivot_wide(ds, key: str, pivot_col: str, value_col: str,
               agg: str = "sum", num_partitions: int = 16):
    """SQL ``PIVOT``: long → wide, one column per pivot value. The corpus
    reduces through ONE combiner-first :func:`hash_agg` on (key, pivot); the
    reshape runs on that group-cardinality result (pandas pivot on the
    driver — wide outputs are small by contract; a pivot with millions of
    distinct pivot values belongs in a table, not a matrix). Missing cells
    are 0 for sum/count, NaN for max/min; pivot columns sort
    deterministically. Rows with a NULL key or NULL pivot value are
    EXCLUDED (pandas pivot semantics; DuckDB PIVOT would mint a "NULL"
    column) — filter-or-fill upstream if a NULL bucket is needed."""
    finest = _collect_group_result(
        hash_agg(ds, [key, pivot_col], {"_v": (value_col, agg)},
                 num_partitions=num_partitions), "pivot_wide")
    if "_part" in finest.columns:
        finest = finest.drop(columns=["_part"])
    wide = finest.pivot(index=key, columns=pivot_col, values="_v")
    # type-stable deterministic order (mixed int/str pivot values would
    # TypeError under plain sorted); reject stringified collisions rather
    # than silently emitting duplicate column labels
    order = sorted(wide.columns, key=lambda c: (type(c).__name__, str(c)))
    wide = wide.reindex(order, axis=1)
    if agg in ("sum", "count"):
        wide = wide.fillna(0)
    names = [str(c) for c in order]
    if len(set(names)) != len(names) or key in names:
        raise ValueError(
            f"pivot values stringify to colliding column names: {names}")
    wide.columns = names
    return wide.reset_index().sort_values(key).reset_index(drop=True)
