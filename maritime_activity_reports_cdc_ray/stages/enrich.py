"""Declarative enrichment stage: ordered CASE ladders, vectorized (M8/M9/M10).

Reference semantics: the silver stream derives enrichment columns from CASE
ladders over row attributes — range bands and set membership chained by
priority (``silver/streaming_processor.py:130-147`` zone banding,
``silver/cdf_processor.py`` dim CASE ladders). There the ladder is a Spark
``when().when().otherwise()`` chain; here it is a declarative rule list
compiled once per task/actor and evaluated with ONE ``np.select`` per ladder —
no per-row Python, no regex in the hot loop.

The enrichment inputs can additionally be recorded in a :class:`LookupCache`
(G4/W6): the replay pipeline MERGEs each epoch's distinct key tuples into
``<lake>/cache`` (see ``EngineConfig.lookup_cache_keys``) — matching the
reference, which computes enrichment inline and persists the distinct inputs
with access counters as a side artifact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class Rule:
    """One CASE branch. ``op``: ``in`` (value = set/list), ``between``
    (value = (lo, hi), inclusive-lo exclusive-hi), ``eq``, ``ge``, ``lt``,
    ``prefix`` (string startswith), ``suffix`` (string endswith)."""

    col: str
    op: str
    value: Any
    out: Any


class CaseLadder:
    """Ordered rules → one output column; first matching rule wins
    (``when().when().otherwise()``). Vectorized: each rule becomes one boolean
    mask, combined with a single ``np.select``."""

    def __init__(self, out_col: str, rules: list[Rule], default: Any):
        self.out_col = out_col
        self.rules = list(rules)
        self.default = default

    def _mask(self, df: pd.DataFrame, r: Rule) -> np.ndarray:
        s = df[r.col]
        if r.op == "in":
            return s.isin(r.value).to_numpy()
        if r.op == "between":
            lo, hi = r.value
            v = s.to_numpy()
            return (v >= lo) & (v < hi)
        if r.op == "eq":
            return (s == r.value).to_numpy()
        if r.op == "ge":
            return (s.to_numpy() >= r.value)
        if r.op == "lt":
            return (s.to_numpy() < r.value)
        if r.op == "prefix":
            return s.str.startswith(r.value, na=False).to_numpy()
        if r.op == "suffix":
            return s.str.endswith(r.value, na=False).to_numpy()
        if r.op == "nonempty":  # non-null AND != "" (completeness checks)
            return (s.notna() & (s.astype(object) != "")).to_numpy()
        raise ValueError(f"unknown op {r.op}")

    def apply(self, df: pd.DataFrame) -> pd.Series:
        if not len(df):
            return pd.Series([], dtype=object)
        masks = [self._mask(df, r) for r in self.rules]
        return pd.Series(
            np.select(masks, [r.out for r in self.rules], default=self.default),
            index=df.index)


def make_enricher(ladders: list[CaseLadder]):
    """A ``map_batches`` stage adding one column per ladder (pandas format —
    the masks are pandas/numpy kernels). Ladders are captured once in the
    task spec; per-batch work is pure vectorized selects."""

    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        for lad in ladders:
            df[lad.out_col] = lad.apply(df)
        return df

    return enrich


# --------------------------------------------------------------------------
# The engine's own dim ladders (code-change domain): path extension + lang →
# (file_kind, ecosystem) — the analogue of the reference's zone banding.
# --------------------------------------------------------------------------
_EXT_SOURCE = ("py", "rs", "go", "js")
_EXT_DOCS = ("md", "rst", "txt")
_EXT_CONFIG = ("json", "yaml", "yml", "toml", "cfg", "ini")

_ECOSYSTEM = {"py": "python", "rs": "rust", "go": "go", "js": "node"}


def extract_ext(path: pd.Series) -> pd.Series:
    """Lowercased final extension ('' when none) — one vectorized rsplit."""
    ext = path.str.rsplit(".", n=1).str[-1].str.lower()
    return ext.where(path.str.contains(".", regex=False), "")


def code_enrichment(df: pd.DataFrame) -> pd.DataFrame:
    """file_kind + ecosystem from the path extension (falling back to lang
    for extensionless paths). Pure vectorized; reusable inside any silver
    ``map_batches``."""
    ext = extract_ext(df["path"])
    eff = ext.where(ext != "", df["lang"].fillna(""))
    kind = CaseLadder("file_kind", [
        Rule("_eff", "in", _EXT_SOURCE, "source"),
        Rule("_eff", "in", _EXT_DOCS, "docs"),
        Rule("_eff", "in", _EXT_CONFIG, "config"),
    ], "other")
    d = df.copy()
    d["_eff"] = eff
    d["file_kind"] = kind.apply(d)
    d["ecosystem"] = eff.map(_ECOSYSTEM).fillna("none")
    return d.drop(columns=["_eff"])
