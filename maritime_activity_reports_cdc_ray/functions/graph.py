"""Distributed graph analytics over Ray datasets.

The iterative-algorithm family next to k-means (functions/similarity.py) and
connected components (functions/dedup.label_components_distributed):
PageRank by power iteration. Reference analogue: the gold-layer "journey" /
transition analytics (``gold/materialized_views.py:254-292``) stop at edge
counts; PageRank is the canonical next step over that same transition graph.

Exactness contract: all arithmetic is fixed-point INTEGER (ranks are
``scale``-denominated), every per-edge contribution is an integer floor
division, and sums of integers are order-independent — so the result is
bit-identical to a SQL engine replaying the same iterations, at any
parallelism, any batching.

Scale shape: the EDGE table streams through ``map_batches`` every iteration
and is never collected; the per-iteration state is the rank VECTOR, O(|V|)
rows, broadcast to edge tasks via the gated ``broadcast_join`` (the
Pregel-with-small-vertex-set regime — right for type/category/entity graphs
up to ~10^7 nodes). For |V| beyond driver memory the same loop runs with
``auto_join``'s shuffle path (co-partitioned edges ⋈ ranks); the iteration
count is the only serial dimension.
"""

from __future__ import annotations

import pandas as pd


def pagerank(edges, *, src: str, dst: str, weight: str, nodes: list,
             iters: int = 3, damping_pct: int = 85, scale: int = 10 ** 12,
             num_partitions: int = 16, driver_gate_rows: int = 200_000,
             node_col: str = "node", rank_col: str = "rank_fp") -> pd.DataFrame:
    """Weighted PageRank over an edge Dataset.

    ``r_{k+1}(v) = (scale·(100−d))//(100·N) + (d · Σ_{u→v} r_k(u)·w(u,v)//outw(u))//100``

    with d = ``damping_pct`` — the textbook damped power iteration, every
    step in exact integer arithmetic (see module docstring). ``nodes`` is
    the explicit vertex set (isolated vertices keep their teleport mass;
    vertices with no out-edges are dangling and leak mass, as in the
    uncorrected classic formulation — replayed identically by the oracle).
    Returns a pandas DataFrame ``(node, rank_fp)``, one row per node.
    """
    from maritime_activity_reports_cdc_ray.functions.join import broadcast_join
    from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

    nodes = sorted(set(nodes))
    n = len(nodes)
    assert n > 0, "empty vertex set"

    # consolidate parallel edges once; pin blocks so every later pass
    # (out-weight reduce, each iteration's contribution map) re-reads the
    # object store, not the upstream pipeline
    e = hash_agg(edges, [src, dst], {"w": (weight, "sum")},
                 num_partitions=num_partitions).materialize()

    tele = (scale * (100 - damping_pct)) // (100 * n)
    r = {v: scale // n for v in nodes}

    if e.count() <= driver_gate_rows:
        # size-gated driver fast path (the label_components pattern): a
        # consolidated edge list this small iterates in one vectorized pandas
        # loop — identical arithmetic, zero per-iteration executor round trips
        epd = e.to_pandas()
        # drop edges whose src is outside the caller's vertex set — the
        # distributed path below drops them implicitly at the inner
        # broadcast_join(e, rdf); without this the driver path would raise
        # on the NaN from epd[src].map(r), diverging on the same input.
        epd = epd[epd[src].isin(r)].reset_index(drop=True)
        if epd.empty:
            flat = tele if iters > 0 else scale // n
            return pd.DataFrame({node_col: nodes,
                                 rank_col: [flat] * n}).astype(
                {rank_col: "int64"})
        ow = epd.groupby(src)["w"].transform("sum").astype("int64")
        w = epd["w"].astype("int64")
        for _ in range(iters):
            rv = epd[src].map(r).astype("int64")
            c = (rv * w // ow).groupby(epd[dst]).sum()
            r = {v: tele + (damping_pct * int(c.get(v, 0))) // 100
                 for v in nodes}
        return pd.DataFrame({node_col: nodes,
                             rank_col: [r[v] for v in nodes]}).astype(
            {rank_col: "int64"})

    outw = hash_agg(e, src, {"ow": ("w", "sum")},
                    num_partitions=num_partitions).to_pandas()  # O(|V|)
    e = broadcast_join(e, outw, on=[src])

    def contrib_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            dst: df[dst],
            "c": (df["_r"].astype("int64") * df["w"].astype("int64"))
                 // df["ow"].astype("int64"),
        })

    for _ in range(iters):
        rdf = pd.DataFrame({src: list(r), "_r": [r[v] for v in r]})
        contrib = hash_agg(
            broadcast_join(e, rdf, on=[src]).map_batches(
                contrib_fn, batch_format="pandas"),
            dst, {"c": ("c", "sum")}, num_partitions=num_partitions
        ).to_pandas()
        cmap = dict(zip(contrib[dst], contrib["c"]))
        r = {v: tele + (damping_pct * int(cmap.get(v, 0))) // 100
             for v in nodes}

    return pd.DataFrame({node_col: nodes,
                         rank_col: [r[v] for v in nodes]}).astype(
        {rank_col: "int64"})
