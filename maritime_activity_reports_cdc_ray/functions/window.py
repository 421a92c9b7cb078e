"""Per-key ordered (windowed) computation over Ray datasets.

Reference analogues (SURVEY.md §2.3):

- W1 lag/lead enrichment — ``Window.partitionBy(imo).orderBy(ts)`` + lag/lead
  deltas (``silver/cdf_processor.py:140-204``),
- W2 transition detection (``gold/cdf_processor.py:138-157``),
- W3 latest-record-per-key argmax (``silver/table_setup.py:298-324``),
- W4 sequence numbering + adjacent pairing (``gold/materialized_views.py:254-292``),
- W5 rank within partition (``gold/table_setup.py:466-467``).

Execution shape: ``ds.groupby(key).map_groups(fn, batch_format="pandas")`` —
one shuffle on the key, then a vectorized pandas kernel per group (sort by the
order column + shift/cumsum; never a Python row loop). ``latest_per_key``
additionally pre-reduces inside ``map_batches`` (one candidate row per key per
batch) so the shuffle moves candidates, not the full table — the combiner
pattern the guide prescribes for aggregation at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def per_key_lag(ds, key: str, order: list[str], lag_cols: dict[str, str]):
    """Append ``prev_<col>`` columns (lag 1) per key ordered by ``order``.

    ``lag_cols`` maps source column → output column name.
    """

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        for src, dst in lag_cols.items():
            g[dst] = g[src].shift(1)
        return g

    return ds.groupby(key).map_groups(f, batch_format="pandas")


def latest_per_key(ds, key: str | list[str], order: list[str]):
    """Argmax per key (LWW view): the row with the greatest ``order`` tuple.
    Two-stage: per-batch reduce (combiner) → per-key reduce after the shuffle."""
    keys = [key] if isinstance(key, str) else list(key)

    def reduce_batch(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(keys + order, kind="mergesort")
        return df.groupby(keys, as_index=False, sort=False).tail(1)

    pre = ds.map_batches(reduce_batch, batch_format="pandas")
    return pre.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        reduce_batch, batch_format="pandas"
    )


def transitions(ds, key: str, order: list[str], col: str):
    """Rows where ``col`` differs from the previous row of the same key
    (zone-entry analogue). Adds ``prev_<col>`` and keeps only transitions;
    the first row of a key counts as a transition from null."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        g[f"prev_{col}"] = g[col].shift(1)
        return g[(g[col] != g[f"prev_{col}"]) | g[f"prev_{col}"].isna()]

    return ds.groupby(key).map_groups(f, batch_format="pandas")


def scd2_view(ds, key: str, order: str):
    """Turn an event log into SCD2 version rows: ``valid_from`` = own order
    value, ``valid_to`` = next row's (null for the open version),
    ``is_current`` flag (reference: SCD2 columns bronze/table_setup.py:113-116)."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        g["valid_from"] = g[order]
        g["valid_to"] = g[order].shift(-1)
        g["is_current"] = g["valid_to"].isna()
        return g

    return ds.groupby(key).map_groups(f, batch_format="pandas")


def sessionize(ds, key: str, ts_col: str, gap_seconds: float):
    """Assign per-key session ids: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``. Session id = cumulative count of
    session starts within the key (1-based)."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col], kind="mergesort")
        gap = g[ts_col].diff().dt.total_seconds()
        g["session_id"] = (gap.isna() | (gap > gap_seconds)).cumsum().astype("int64")
        return g

    return ds.groupby(key).map_groups(f, batch_format="pandas")


def rank_within(ds, partition: str, order_col: str, descending: bool = True,
                rank_col: str = "rnk"):
    """SQL RANK() OVER (PARTITION BY partition ORDER BY order_col) — ties get
    the same rank, next rank skips (competition ranking)."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, partition], ascending=[not descending, True],
                          kind="mergesort")
        g[rank_col] = (
            g[order_col].rank(method="min", ascending=not descending).astype("int64")
        )
        return g

    return ds.groupby(partition).map_groups(f, batch_format="pandas")


def adjacent_pairs(ds, key: str, order: list[str], cols: list[str]):
    """Pair each row with its predecessor per key (journey pairing, W4):
    emits rows 2..n of each key with ``prev_<col>`` columns — the map_groups
    translation of the reference's ROW_NUMBER + self-join on seq = seq+1
    (gold/materialized_views.py:254-292), computed in one pass."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        for c in cols:
            g[f"prev_{c}"] = g[c].shift(1)
        return g.iloc[1:]

    return ds.groupby(key).map_groups(f, batch_format="pandas")


def global_rank(ds, order_col: str, descending: bool = True, rank_col: str = "rnk"):
    """Global competition rank via a full sort + zip-with-index (small results
    only — the reference uses it for a ranking view, W5)."""
    # ranks depend on global order → compute on the driver for small results
    df = ds.sort(order_col, descending=descending).to_pandas()
    vals = df[order_col].to_numpy()
    if descending:
        rnk = pd.Series(vals).rank(method="min", ascending=False).astype("int64")
    else:
        rnk = pd.Series(vals).rank(method="min", ascending=True).astype("int64")
    df[rank_col] = rnk.to_numpy()
    return df
