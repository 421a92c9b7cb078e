"""Predicate-pushdown reads: partition pruning on the hash key (Delta
partition-filter analogue) + scanner-level exact filtering (data skipping).

Correctness contract: a predicate read returns EXACTLY the rows a full read
plus a post-filter returns — pruning may only skip files that cannot hold a
matching row."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.generate import generate_events
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

    root = tmp_path_factory.mktemp("pruned")
    events = str(root / "events")
    generate_events(events, n_events=4000, n_repos=24, n_epochs=3, seed=7)
    r = CDCReplay(str(root / "lake"), EngineConfig(num_partitions=8))
    r.setup()
    r.run(events)
    return r


def _df(ds):
    return ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)


def _pick_repo(r):
    return sorted(r.read_silver(columns=["repo"]).to_pandas().repo.unique())[0]


def test_prune_fragments_by_key_unit(lake):
    from maritime_activity_reports_cdc_ray.stages.partition import (
        pid_of_repo, prune_fragments_by_key)

    sm = lake.silver.latest_manifest()
    frags = [f for f in sm.fragments if f.kind == "current"]
    repo = _pick_repo(lake)
    kept = prune_fragments_by_key(frags, ("repo", "==", repo), sm.num_partitions)
    want_pid = pid_of_repo(repo, sm.num_partitions)
    assert kept and all(f.pid == want_pid for f in kept)
    assert len(kept) < len(frags)  # pruning actually skips files
    # non-key predicate keeps everything (scanner filter handles it)
    assert len(prune_fragments_by_key(frags, ("lang", "==", "py"),
                                      sm.num_partitions)) == len(frags)


def test_silver_point_read_matches_post_filter(lake):
    repo = _pick_repo(lake)
    full = _df(lake.read_silver())
    pruned = _df(lake.read_silver(predicate=("repo", "==", repo)))
    want = full[full.repo == repo].reset_index(drop=True)
    pd.testing.assert_frame_equal(pruned, want.reset_index(drop=True))
    assert len(pruned) > 0


def test_silver_predicate_with_virtual_content(lake):
    repo = _pick_repo(lake)
    pruned = _df(lake.read_silver(columns=["repo", "path", "content"],
                                  predicate=("repo", "==", repo)))
    full = _df(lake.read_silver(columns=["repo", "path", "content"]))
    want = full[full.repo == repo].reset_index(drop=True)
    pd.testing.assert_frame_equal(pruned, want)
    assert pruned.content.notna().all()


def test_silver_in_and_range_predicates(lake):
    full = _df(lake.read_silver())
    repos = sorted(full.repo.unique())[:3]
    got = _df(lake.read_silver(predicate=("repo", "in", repos)))
    want = full[full.repo.isin(repos)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    lo, hi = 100, 240
    got = _df(lake.read_silver(predicate=("content_bytes", "between", (lo, hi))))
    want = full[(full.content_bytes >= lo) & (full.content_bytes <= hi)] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_history_and_gold_predicates(lake):
    repo = _pick_repo(lake)
    hf = lake.read_history().to_pandas()
    hp = lake.read_history(predicate=("repo", "==", repo)).to_pandas()
    assert len(hp) == (hf.repo == repo).sum() and (hp.repo == repo).all()

    gf = lake.read_gold().to_pandas()
    gp = lake.read_gold(predicate=("repo", "==", repo)).to_pandas()
    assert len(gp) == 1 and gp.iloc[0].repo == repo
    row_full = gf[gf.repo == repo].iloc[0]
    assert gp.iloc[0].file_count == row_full.file_count
    assert gp.iloc[0].total_bytes == row_full.total_bytes


def test_predicate_composes_with_time_travel(lake):
    repo = _pick_repo(lake)
    for e in (0, 2):
        full = _df(lake.read_silver(as_of_epoch=e))
        got = _df(lake.read_silver(as_of_epoch=e, predicate=("repo", "==", repo)))
        want = full[full.repo == repo].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_content_predicate_rejected(lake):
    with pytest.raises(ValueError, match="content"):
        lake.read_silver(predicate=("content", "==", "x"))


def test_no_match_predicate_returns_empty_with_schema(lake):
    ds = lake.read_silver(predicate=("repo", "==", "no/such-repo"))
    df = ds.to_pandas()
    assert len(df) == 0


def test_cluster_by_compaction(lake):
    """OPTIMIZE ... ZORDER BY analogue (reference: gold/table_setup.py:374-379):
    compacting with cluster_by re-sorts fragments so row-group min/max stats
    become selective on the cluster column, while every read contract
    (full read, predicate read, virtual content) is preserved bit-for-bit."""
    import pyarrow.parquet as pq

    from maritime_activity_reports_cdc_ray.pipelines.maintenance import compact_table

    before = _df(lake.read_silver(live_only=False))
    stats = compact_table(lake.silver, kinds=("current",), cluster_by=["lang"],
                          row_group_size=64, include_single=True)
    assert stats["compacted_groups"] > 0

    # data identical after re-clustering
    after = _df(lake.read_silver(live_only=False))
    pd.testing.assert_frame_equal(after, before)

    # fragments are lang-sorted with tight row groups: in every compacted
    # fragment, row groups are non-overlapping on lang (min of group i+1 >=
    # max of group i), which is what enables statistics-based skipping
    m = lake.silver.latest_manifest()
    frags = [f for f in m.fragments if f.kind == "current"]
    saw_multi_group = False
    for f in frags:
        md = pq.ParquetFile(lake.silver.abspath(f.path)).metadata
        idx = md.schema.names.index("lang")
        bounds = [(md.row_group(i).column(idx).statistics.min,
                   md.row_group(i).column(idx).statistics.max)
                  for i in range(md.num_row_groups)]
        saw_multi_group = saw_multi_group or len(bounds) > 1
        # nulls (deleted rows) sort last → trailing all-null groups have None
        # stats; every non-null pair must be ordered
        for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
            if hi1 is not None and lo2 is not None:
                assert lo2 >= hi1
    assert saw_multi_group  # row_group_size actually took effect

    # predicate read on the clustered column still exact
    langs = sorted(before.lang.dropna().unique())
    got = _df(lake.read_silver(live_only=False, predicate=("lang", "==", langs[0])))
    want = before[before.lang == langs[0]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
