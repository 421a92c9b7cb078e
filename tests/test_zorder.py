"""Z-order clustering (Delta OPTIMIZE ZORDER BY analogue).

Contract: compacting with zorder=True over two independent columns makes
parquet row-group min/max stats selective for predicates on EITHER column,
where the lexicographic cluster_by sort is only selective on the leading
one; row content is a permutation (nothing lost); deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from maritime_activity_reports_cdc_ray.pipelines.maintenance import (
    compact_table,
    zorder_indices,
)
from maritime_activity_reports_cdc_ray.state.table import LakeTable

N = 40_000
RG = 2_000  # row group size -> 20 groups


def _table(seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "repo": pa.array([f"r{int(x):03d}" for x in rng.integers(0, 40, N)]),
        "path": pa.array([f"p{i}" for i in range(N)]),
        "commit": pa.array([f"c{i:012d}" for i in range(N)]),
        "lang": pa.array([f"l{int(x):02d}" for x in rng.integers(0, 40, N)]),
    })


def _overlapping_groups(path: str, col: str, value: str) -> int:
    md = pq.ParquetFile(path).metadata
    ci = md.schema.to_arrow_schema().get_field_index(col)
    n = 0
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics
        if st.min <= value <= st.max:
            n += 1
    return n, md.num_row_groups


def _compacted(tmp_path, tag, **kw):
    import ray  # noqa: F401 — session fixture

    lake = LakeTable.create(str(tmp_path / tag), tag, _table().schema, 4)
    t = _table()
    half = t.num_rows // 2
    f0 = lake.stage_fragment(t.slice(0, half), 0, 0, 0, "history")
    f1 = lake.stage_fragment(t.slice(half), 0, 0, 0, "history", suffix="b")
    lake.commit_epoch(0, [f0, f1])
    out = compact_table(lake, kinds=("history",), row_group_size=RG,
                        cluster_by=["lang", "repo"], **kw)
    assert out["compacted_groups"] == 1
    m = lake.latest_manifest()
    assert len(m.fragments) == 1
    return lake, lake.abspath(m.fragments[0].path)


def test_zorder_prunes_both_columns(ray_session, tmp_path):
    _, lex_path = _compacted(tmp_path, "lex", zorder=False)
    lakez, z_path = _compacted(tmp_path, "zord", zorder=True)

    lex_lang, total = _overlapping_groups(lex_path, "lang", "l07")
    lex_repo, _ = _overlapping_groups(lex_path, "repo", "r007")
    z_lang, _ = _overlapping_groups(z_path, "lang", "l07")
    z_repo, _ = _overlapping_groups(z_path, "repo", "r007")

    assert total == N // RG
    # lexicographic: great on the leading col, useless on the second
    assert lex_lang <= 2
    assert lex_repo == total
    # z-order: selective on BOTH (each ~sqrt of the groups for 2 dims)
    assert z_lang < total // 2
    assert z_repo < total // 2

    # permutation: same multiset of rows
    orig = _table().to_pandas().sort_values("path").reset_index(drop=True)
    got = (pq.read_table(z_path).to_pandas()[orig.columns.tolist()]
           .sort_values("path").reset_index(drop=True))
    assert got.equals(orig)


def test_zorder_deterministic():
    t = _table()
    a = zorder_indices(t, ["lang", "repo"])
    b = zorder_indices(t, ["lang", "repo"])
    assert (a == b).all()


def test_zorder_null_safe():
    """Silver current fragments carry delete sentinels with null lang —
    z-ordering must handle nulls (code 0, cluster at the origin)."""
    t = pa.table({
        "lang": pa.array(["a", None, "b", None]),
        "repo": pa.array(["r1", "r2", None, "r0"]),
    })
    idx = zorder_indices(t, ["lang", "repo"])
    assert sorted(idx.tolist()) == [0, 1, 2, 3]


def test_zorder_column_bound_validated_on_driver(ray_session, tmp_path):
    """compact_table(zorder=True) validates the 2-4 cluster-column bound
    BEFORE dispatching Ray tasks (the API mirror of the CLI check) — a 5+
    column request fails with a clear ValueError, not an opaque remote
    assert."""
    import pytest

    from maritime_activity_reports_cdc_ray.pipelines.maintenance import compact_table

    from maritime_activity_reports_cdc_ray.state.table import LakeTable

    t = _table()
    lake = LakeTable.create(str(tmp_path / "zb"), "zb", t.schema, 4)
    f0 = lake.stage_fragment(t, 0, 0, 0, "history")
    lake.commit_epoch(0, [f0])
    with pytest.raises(ValueError, match="2-4"):
        compact_table(lake, kinds=("history",), zorder=True,
                      cluster_by=["a", "b", "c", "d", "e"])
    with pytest.raises(ValueError, match="2-4"):
        compact_table(lake, kinds=("history",), zorder=True,
                      cluster_by=["a"])
