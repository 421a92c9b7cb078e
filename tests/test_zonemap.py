"""Zone maps (manifest-level data skipping — the Delta per-file
min/max-statistics analogue).

Safety contract: pruning may only drop a fragment that provably holds no
matching row. The hypothesis differential pins it: for random tables split
into fragments and random predicates, every PRUNED fragment filters to zero
rows and the KEPT fragments reproduce the full filter exactly.
"""

import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from maritime_activity_reports_cdc_ray.state.table import Fragment
from maritime_activity_reports_cdc_ray.state.zonemap import (
    ZMAP_MAX_STR,
    column_stats,
    prune_fragments_by_stats,
    zmap_from_footer,
    zmap_of_table,
)


def frag(zmap, rows=10):
    return Fragment(path="x", pid=0, salt=0, kind="current", epoch=0,
                    rows=rows, bytes=0, zmap=zmap)


# ---------------------------------------------------------------- unit: compute
def test_zmap_types_and_nulls():
    t = pa.table({
        "i": pa.array([3, 1, None, 7], pa.int64()),
        "f": pa.array([1.5, -2.0, 0.0, None], pa.float64()),
        "s": pa.array(["b", "a", "c", None], pa.string()),
        "b": pa.array([True, False, True, True], pa.bool_()),
        "ts": pa.array([datetime.datetime(2024, 1, 1),
                        datetime.datetime(2024, 1, 3), None, None],
                       pa.timestamp("us")),
        "nested": pa.array([[1], [2], [], None], pa.list_(pa.int64())),
    })
    z = zmap_of_table(t)
    assert z["i"] == [1, 7, 1]
    assert z["f"] == [-2.0, 1.5, 1]
    assert z["s"] == ["a", "c", 1]
    assert z["b"] == [False, True, 0]
    mn, mx, nulls = z["ts"]
    assert nulls == 2 and isinstance(mn, int) and isinstance(mx, int)
    assert mx - mn == 2 * 24 * 3600 * 1_000_000  # two days in micros
    assert "nested" not in z  # unbounded types are omitted


def test_zmap_nan_and_allnull_and_wide():
    t = pa.table({
        "nan": pa.array([1.0, float("nan")], pa.float64()),
        "allnull": pa.array([None, None], pa.string()),
        "wide": pa.array(["x" * 5000, "y" * 5000], pa.large_string()),
    })
    z = zmap_of_table(t)
    assert "nan" not in z  # NaN breaks ordered bounds
    assert z["allnull"] == [None, None, 2]
    assert "wide" not in z  # payload-width columns carry no stats


def test_zmap_indexed_col_cap_and_hash_exclusion():
    # Delta's dataSkippingNumIndexedCols analogue: only the first N schema
    # columns carry bounds, and the engine's uniform shuffle hash never does.
    from maritime_activity_reports_cdc_ray.state.zonemap import (
        ZMAP_EXCLUDE, ZMAP_NUM_INDEXED_COLS)

    ncols = ZMAP_NUM_INDEXED_COLS + 8
    cols = {f"c{i:03d}": pa.array([i, i + 1], pa.int64()) for i in range(ncols)}
    cols["path_hash"] = pa.array([0, 2**63], pa.uint64())
    t = pa.table(cols)  # path_hash lands past the cap too, but test both gates
    z = zmap_of_table(t)
    assert "path_hash" not in z and "path_hash" in ZMAP_EXCLUDE
    assert set(z) == {f"c{i:03d}" for i in range(ZMAP_NUM_INDEXED_COLS)}

    # explicit exclusion gate, independent of position
    t2 = pa.table({"path_hash": pa.array([1, 2], pa.uint64()),
                   "k": pa.array([5, 9], pa.int64())})
    z2 = zmap_of_table(t2)
    assert "path_hash" not in z2 and z2["k"] == [5, 9, 0]

    # safety: a predicate on an un-indexed column prunes nothing
    fs = [frag(z, rows=2)]
    tail = f"c{ZMAP_NUM_INDEXED_COLS + 1:03d}"
    assert prune_fragments_by_stats(fs, (tail, "==", -1)) == fs
    # ... while an indexed column still skips
    assert prune_fragments_by_stats(fs, ("c000", "==", -1)) == []


def test_zmap_from_footer_cap_and_exclusion(tmp_path):
    from maritime_activity_reports_cdc_ray.state.zonemap import (
        ZMAP_NUM_INDEXED_COLS)

    ncols = ZMAP_NUM_INDEXED_COLS + 4
    cols = {"path_hash": pa.array([3, 4], pa.uint64())}
    cols.update({f"c{i:03d}": pa.array([i, i + 1], pa.int64())
                 for i in range(ncols)})
    t = pa.table(cols)
    p = tmp_path / "f.parquet"
    pq.write_table(t, p)
    z = zmap_from_footer(pq.read_metadata(p), t.schema)
    assert "path_hash" not in z
    # path_hash occupies slot 0, so indexed data columns = first cap-1
    assert set(z) == {f"c{i:03d}" for i in range(ZMAP_NUM_INDEXED_COLS - 1)}


def test_zmap_long_string_truncation():
    lo = "a" * (ZMAP_MAX_STR + 10)
    hi = "z" * (ZMAP_MAX_STR + 10)
    z = zmap_of_table(pa.table({"s": [lo, hi]}))
    mn, mx, nulls = z["s"]
    assert mn == "a" * ZMAP_MAX_STR  # a prefix is still a lower bound
    assert mx is None  # a prefix is NOT an upper bound
    # pruning with an unknown upper bound stays conservative
    fs = [frag({"s": [mn, mx, 0]}, rows=2)]
    assert prune_fragments_by_stats(fs, ("s", ">", "zzz"))  # kept
    assert not prune_fragments_by_stats(fs, ("s", "<", "a"))  # min proves skip


# ---------------------------------------------------------------- unit: prune
@pytest.mark.parametrize("pred,kept", [
    (("v", "==", 5), True), (("v", "==", 11), False), (("v", "==", 0), False),
    (("v", "!=", 5), True),
    (("v", "<", 1), False), (("v", "<", 2), True),
    (("v", "<=", 0), False), (("v", "<=", 1), True),
    ((("v"), ">", 10), False), (("v", ">", 9), True),
    (("v", ">=", 11), False), (("v", ">=", 10), True),
    (("v", "in", [0, 11]), False), (("v", "in", [0, 7]), True),
    (("v", "between", (11, 20)), False), (("v", "between", (-5, 0)), False),
    (("v", "between", (10, 12)), True),
])
def test_prune_ops(pred, kept):
    fs = [frag({"v": [1, 10, 0]})]
    assert bool(prune_fragments_by_stats(fs, pred)) is kept


def test_prune_conservative_cases():
    # no zmap / missing column / type mismatch / None value → always kept
    assert prune_fragments_by_stats([frag(None)], ("v", "==", 1))
    assert prune_fragments_by_stats([frag({})], ("v", "==", 1))
    assert prune_fragments_by_stats([frag({"w": [0, 1, 0]})], ("v", "==", 1))
    assert prune_fragments_by_stats([frag({"v": ["a", "b", 0]})], ("v", "==", 1))
    assert prune_fragments_by_stats([frag({"v": [1, 10, 0]})], ("v", "==", None))
    # None inside an IN list is rejected at the API boundary: Arrow's isin
    # matches nulls (unlike SQL IN (NULL)), which would break skip safety
    with pytest.raises(ValueError, match="IN list"):
        prune_fragments_by_stats([frag({"v": [1, 10, 0]})], ("v", "in", [None, 99]))
    # != only skips when every non-null value equals the literal
    assert not prune_fragments_by_stats([frag({"v": [5, 5, 2]})], ("v", "!=", 5))
    assert prune_fragments_by_stats([frag({"v": [5, 6, 0]})], ("v", "!=", 5))


def test_prune_all_null_column_skips():
    fs = [frag({"v": [None, None, 10]}, rows=10)]
    for pred in [("v", "==", 1), ("v", "!=", 1), ("v", "<", 1),
                 ("v", "in", [1, 2]), ("v", "between", (0, 9))]:
        assert prune_fragments_by_stats(fs, pred) == []


def test_prune_temporal_predicate():
    t = pa.table({"ts": pa.array([datetime.datetime(2024, 1, 1),
                                  datetime.datetime(2024, 1, 5)],
                                 pa.timestamp("us"))})
    fs = [frag(zmap_of_table(t), rows=2)]
    assert not prune_fragments_by_stats(fs, ("ts", ">", datetime.datetime(2024, 2, 1)))
    assert prune_fragments_by_stats(fs, ("ts", ">=", datetime.datetime(2024, 1, 3)))
    assert not prune_fragments_by_stats(fs, ("ts", "<", datetime.date(2024, 1, 1)))


# ---------------------------------------------------------------- footer fold
def test_zmap_from_footer_matches_table_zmap(tmp_path):
    t = pa.table({
        "i": pa.array(list(range(100)) + [None], pa.int64()),
        "s": pa.array([f"k{j:03d}" for j in range(101)], pa.string()),
        "f": pa.array([float(j) for j in range(101)], pa.float64()),
    })
    p = str(tmp_path / "f.parquet")
    pq.write_table(t, p, row_group_size=17)  # several row groups to fold
    z = zmap_from_footer(pq.read_metadata(p), pq.read_schema(p))
    assert z["i"] == [0, 99, 1]
    assert z["s"] == ["k000", "k100", 0]
    assert z["f"] == [0.0, 100.0, 0]


# ------------------------------------------------------------- hypothesis safety
@settings(max_examples=120, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.integers(-20, 20), st.none()), min_size=1, max_size=60),
    nfrag=st.integers(1, 5),
    op=st.sampled_from(["==", "!=", "<", "<=", ">", ">=", "in", "between"]),
    a=st.integers(-25, 25),
    b=st.integers(-25, 25),
)
def test_prune_never_drops_a_matching_row(vals, nfrag, op, a, b):
    from maritime_activity_reports_cdc_ray.stages.partition import (
        predicate_expression)

    if op == "in":
        pred = ("v", "in", [a, b])
    elif op == "between":
        pred = ("v", "between", (min(a, b), max(a, b)))
    else:
        pred = ("v", op, a)
    step = max(1, len(vals) // nfrag)
    chunks = [vals[i:i + step] for i in range(0, len(vals), step)]
    frags = []
    for ci, c in enumerate(chunks):
        t = pa.table({"v": pa.array(c, pa.int64())})
        frags.append(Fragment(path=str(ci), pid=0, salt=0, kind="current",
                              epoch=0, rows=t.num_rows, bytes=0,
                              zmap=zmap_of_table(t)))
    kept = {f.path for f in prune_fragments_by_stats(frags, pred)}
    expr = predicate_expression(pred)
    for ci, c in enumerate(chunks):
        t = pa.table({"v": pa.array(c, pa.int64())})
        matches = len(t.filter(expr))
        if str(ci) not in kept:
            assert matches == 0, f"pruned fragment {ci} held {matches} matches"


# ---------------------------------------------------------------- e2e read path
@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.generate import generate_events
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

    root = tmp_path_factory.mktemp("zmap")
    events = str(root / "events")
    generate_events(events, n_events=3000, n_repos=16, n_epochs=3, seed=11)
    r = CDCReplay(str(root / "lake"), EngineConfig(num_partitions=8))
    r.setup()
    r.run(events)
    return r


def test_fragments_carry_zone_maps(lake):
    sm = lake.silver.latest_manifest()
    cur = [f for f in sm.fragments if f.kind == "current"]
    assert cur and all(f.zmap for f in cur)
    for f in cur:
        assert "content_epoch" in f.zmap and "repo" in f.zmap
        mn, mx, nulls = f.zmap["content_epoch"]
        assert mn is not None and mx is not None and mn <= mx


def test_predicate_read_with_stats_pruning_is_exact(lake):
    full = lake.read_silver().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    lo, hi = 120, 260
    got = lake.read_silver(
        predicate=("content_bytes", "between", (lo, hi))).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    want = full[(full.content_bytes >= lo) & (full.content_bytes <= hi)] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_impossible_predicate_prunes_every_fragment(lake):
    from maritime_activity_reports_cdc_ray.state.zonemap import (
        prune_fragments_by_stats)

    sm = lake.silver.latest_manifest()
    cur = [f for f in sm.fragments if f.kind == "current"]
    assert prune_fragments_by_stats(cur, ("content_bytes", "<", -1)) == []
    # and the read itself returns an empty, correctly-typed result
    ds = lake.read_silver(predicate=("content_bytes", "<", -1))
    assert ds.count() == 0


def test_attach_content_uses_zone_maps(lake, monkeypatch):
    """The virtual-content join must bound its bronze scan from manifest
    zone maps without any driver footer reads (footers are the legacy
    fallback only)."""
    import maritime_activity_reports_cdc_ray.pipelines.replay as rp

    calls = []
    orig = rp.pq.read_metadata
    monkeypatch.setattr(rp.pq, "read_metadata",
                        lambda p, *a, **k: calls.append(p) or orig(p, *a, **k))
    t = lake.read_silver(columns=["repo", "path", "content"]).to_pandas()
    assert t.content.notna().any()
    frag_footers = [c for c in calls if "fragments/" in str(c) and "current" in str(c)]
    assert frag_footers == []


def test_predicate_on_unknown_column_fails_at_the_boundary(lake):
    # a clear driver-side ValueError, not an ArrowInvalid inside a scan task
    for read in (lake.read_silver, lake.read_history, lake.read_gold):
        with pytest.raises(ValueError, match="no_such_col"):
            read(predicate=("no_such_col", "==", 1))
    # compound: one bad conjunct is enough
    with pytest.raises(ValueError, match="no_such_col"):
        lake.read_silver(predicate=[("repo", "==", "r"),
                                    ("no_such_col", ">", 0)])
    # known columns still read fine on every path
    assert lake.read_history(predicate=("repo", "!=", "")).count() >= 0
    assert lake.read_gold(predicate=("repo", "!=", "")).count() > 0


def test_column_stats_analyze_surface(lake):
    sm = lake.silver.latest_manifest()
    cs = column_stats(sm, kind="current")
    assert cs["content_bytes"]["min"] >= 0
    assert cs["content_bytes"]["rows_covered"] > 0
    assert cs["is_deleted"]["min"] in (False, True)


def test_compound_predicate_normalize_and_expression():
    from maritime_activity_reports_cdc_ray.stages.partition import (
        normalize_predicate, predicate_expression)

    assert normalize_predicate(("a", "==", 1)) == [("a", "==", 1)]
    assert normalize_predicate([("a", "==", 1), ("b", "<", 2)]) == \
        [("a", "==", 1), ("b", "<", 2)]
    with pytest.raises(ValueError):
        normalize_predicate(("a", "~~", 1))
    with pytest.raises(ValueError):
        normalize_predicate([])
    t = pa.table({"a": [1, 1, 2, 1], "b": [0, 5, 0, 9]})
    got = t.filter(predicate_expression([("a", "==", 1), ("b", ">", 4)]))
    assert got.column("b").to_pylist() == [5, 9]


def test_compound_predicate_prunes_by_every_conjunct():
    fs = [frag({"a": [0, 5, 0], "b": [10, 20, 0]}),
          frag({"a": [6, 9, 0], "b": [10, 20, 0]}),
          frag({"a": [0, 5, 0], "b": [30, 40, 0]})]
    kept = prune_fragments_by_stats(
        fs, [("a", "<=", 5), ("b", "between", (15, 25))])
    assert kept == [fs[0]]


def test_compound_predicate_read_is_exact(lake):
    full = lake.read_silver().to_pandas()
    langs = sorted(full.lang.dropna().unique())
    pred = [("lang", "==", langs[0]), ("content_bytes", ">", 150)]
    got = lake.read_silver(predicate=pred).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    want = full[(full.lang == langs[0]) & (full.content_bytes > 150)] \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_compound_predicate_with_key_conjunct_prunes_partitions(lake):
    from maritime_activity_reports_cdc_ray.stages.partition import (
        pid_of_repo, prune_fragments_by_key)

    sm = lake.silver.latest_manifest()
    cur = [f for f in sm.fragments if f.kind == "current"]
    repo = sorted(lake.read_silver(columns=["repo"]).to_pandas().repo.unique())[0]
    pred = [("repo", "==", repo), ("content_bytes", ">=", 0)]
    kept = prune_fragments_by_key(cur, pred, sm.num_partitions)
    assert kept and all(f.pid == pid_of_repo(repo, sm.num_partitions) for f in kept)
    got = lake.read_silver(predicate=pred).to_pandas()
    assert set(got.repo) == {repo}


def test_predicate_on_evolved_column_skips_preevolution_fragments(
        ray_session, tmp_path):
    """Regression: a predicate on an additively-evolved column used to crash
    the scanner (ArrowInvalid: field not found) on fragments committed
    before the evolution. Those fragments backfill the column to NULL, which
    no predicate op matches — the reader must skip them, not crash."""
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay
    from maritime_activity_reports_cdc_ray.stages.partition import pid_of_repo

    P = 4
    repos = [f"r{i}" for i in range(12)]
    # epoch 1 (which introduces size_hint) touches only the repos of ONE
    # pid, so the other pids keep their pre-evolution current fragments
    target_pid = pid_of_repo("r0", P)
    evolved_repos = [x for x in repos if pid_of_repo(x, P) == target_pid]
    assert 0 < len(evolved_repos) < len(repos)
    ev = tmp_path / "events"
    ev.mkdir()

    def rows(rs, commit, size=None):
        t = {"repo": pa.array(rs), "path": pa.array(["f.py"] * len(rs)),
             "commit": pa.array([commit] * len(rs)),
             "lang": pa.array(["py"] * len(rs)),
             "content": pa.array(["x"] * len(rs), pa.large_string())}
        if size is not None:
            t["size_hint"] = pa.array([size] * len(rs), pa.int64())
        return pa.table(t)

    pq.write_table(rows(repos, "c000000000001"), str(ev / "e0.parquet"))
    pq.write_table(rows(evolved_repos, "c000000000002", size=500),
                   str(ev / "e1.parquet"))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=P))
    r.setup()
    r.run(str(ev))
    sm = r.silver.latest_manifest()
    assert any(f.cols is not None and "size_hint" not in f.cols
               for f in sm.fragments if f.kind == "current"), \
        "fixture must leave an untouched pre-evolution fragment"
    got = r.read_silver(columns=["repo", "size_hint"],
                        predicate=("size_hint", ">", 100)).to_pandas()
    assert sorted(got.repo) == sorted(evolved_repos)
    assert (got.size_hint == 500).all()
    # compound with one base + one evolved conjunct
    got2 = r.read_silver(columns=["repo", "size_hint"],
                         predicate=[("lang", "==", "py"),
                                    ("size_hint", "<=", 500)]).to_pandas()
    assert sorted(got2.repo) == sorted(evolved_repos)
    # predicate matched by NO fragment group → empty, schema-stable
    empty = r.read_silver(columns=["repo", "size_hint"],
                          predicate=("size_hint", ">", 10_000)).to_pandas()
    assert len(empty) == 0


def test_compact_split_fragments_enable_file_skipping(ray_session, tmp_path):
    """compact_table(target_fragment_rows=...) splits clustered output at
    range boundaries; the resulting per-fragment zone maps must let a range
    predicate skip whole files while the read stays exact."""
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.generate import generate_events
    from maritime_activity_reports_cdc_ray.pipelines.maintenance import (
        compact_table)
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay
    from maritime_activity_reports_cdc_ray.state.zonemap import (
        prune_fragments_by_stats)

    events = str(tmp_path / "events")
    generate_events(events, n_events=4000, n_repos=6, n_epochs=4, seed=3)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=2))
    r.setup()
    r.run(events)
    full = r.read_history().to_pandas()
    res = compact_table(r.silver, kinds=("history",), cluster_by=["commit"],
                        include_single=True, target_fragment_rows=200)
    assert res["compacted_groups"] > 0
    sm = r.silver.latest_manifest()
    hist = [f for f in sm.fragments if f.kind == "history"]
    assert len(hist) > res["compacted_groups"], "chains must have split"
    assert all(f.rows <= 200 for f in hist)
    # a commit-range predicate prunes whole fragments from the manifest
    cutoff = sorted(full.commit)[len(full) // 10]
    pred = ("commit", "<", cutoff)
    kept = prune_fragments_by_stats(hist, pred)
    assert len(kept) < len(hist), "zone maps must skip split fragments"
    got = r.read_history(predicate=pred).to_pandas() \
        .sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    want = full[full.commit < cutoff] \
        .sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # rerunning the maintenance is idempotent-safe (overwrites, re-commits)
    res2 = compact_table(r.silver, kinds=("history",), cluster_by=["commit"],
                         include_single=False, target_fragment_rows=200)
    full2 = r.read_history().to_pandas() \
        .sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        full2, full.sort_values(["repo", "path", "commit"]).reset_index(drop=True))


def test_compact_split_refuses_current_kind(ray_session, tmp_path):
    from maritime_activity_reports_cdc_ray.pipelines.maintenance import (
        compact_table)

    with pytest.raises(ValueError, match="current"):
        compact_table(object(), kinds=("history", "current"),
                      target_fragment_rows=100)


def test_cli_analyze_verb(lake):
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli", "analyze",
         "--root", lake.root, "--table", "silver"],
        capture_output=True, text=True, check=True)
    cs = json.loads(out.stdout)
    assert cs["content_bytes"]["rows_covered"] > 0
    assert cs["repo"]["min"] is not None


def test_legacy_fragments_without_zmap_still_read(lake):
    # LAST in the module: mutates the lake's manifest in place to simulate
    # a pre-zonemap table (every zmap stripped).
    import json
    import os

    sm = lake.silver.latest_manifest()
    d = json.loads(sm.to_json())
    for f in d["fragments"]:
        f["zmap"] = None
    mp = os.path.join(lake.silver.root, "_manifests",
                      f"manifest-{sm.version:010d}.json")
    with open(mp, "w") as fh:
        json.dump(d, fh)
    full = lake.read_silver().count()
    got = lake.read_silver(predicate=("content_bytes", ">=", 0)).count()
    assert got == full > 0
    c = lake.read_silver(columns=["repo", "content"]).to_pandas()
    assert c.content.notna().any()  # footer-fallback path for content bounds
