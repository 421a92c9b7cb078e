"""Incremental view maintenance (IVM) over the CDF.

Contract: an IncrementalAggView refreshed from the net change feed between
its watermark and the silver epoch equals a FULL recompute of the same
group-by over silver's current state — after every epoch, across deletes
(tombstones), group moves (a key whose lang changes), restarts (state on
disk), and repeated refreshes (exactly-once no-op).
"""

from __future__ import annotations

import pandas as pd

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay
from maritime_activity_reports_cdc_ray.pipelines.views import IncrementalAggView


def _full(r) -> pd.DataFrame:
    sil = r.read_silver().to_pandas()
    if not len(sil):
        return pd.DataFrame(columns=["lang", "n", "sum_content_bytes"])
    return (sil.groupby("lang", as_index=False)
            .agg(n=("lang", "size"),
                 sum_content_bytes=("content_bytes", "sum"))
            .sort_values("lang").reset_index(drop=True))


def _eq(got: pd.DataFrame, exp: pd.DataFrame):
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert got["n"].astype("int64").tolist() == exp["n"].astype("int64").tolist()
    assert got["sum_content_bytes"].astype("int64").tolist() == \
        exp["sum_content_bytes"].astype("int64").tolist()


def test_incremental_view_matches_full_recompute(ray_session, tmp_path):
    d = str(tmp_path / "stream")
    generate_events(d, n_events=2400, n_repos=8, n_epochs=3, seed=17)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = IncrementalAggView(r, "lang_stats_inc", ["lang"], ["content_bytes"])
    for _ in range(3):
        r.run(d, max_epochs=1)
        out = v.refresh()
        assert out["status"] == "refreshed"
        _eq(v.read(), _full(r))
        # immediate re-refresh is a no-op (watermark-guarded)
        out2 = v.refresh()
        assert out2["status"] == "fresh"
        _eq(v.read(), _full(r))
    # restart analogue: a FRESH object over the same lake resumes the state
    v2 = IncrementalAggView(r, "lang_stats_inc", ["lang"], ["content_bytes"])
    assert v2.view_epoch() == r.silver.latest_manifest().epoch
    _eq(v2.read(), _full(r))


def test_incremental_view_multi_epoch_catchup(ray_session, tmp_path):
    """A view that lags several epochs catches up in ONE delta application
    (the feed is the NET change between its watermark and the tip)."""
    d = str(tmp_path / "stream")
    generate_events(d, n_events=2400, n_repos=8, n_epochs=3, seed=23)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = IncrementalAggView(r, "repo_stats_inc", ["repo"], ["content_bytes"])
    r.run(d, max_epochs=1)
    v.refresh()
    r.run(d)  # two more epochs while the view sleeps
    out = v.refresh()
    assert out["status"] == "refreshed"
    sil = r.read_silver().to_pandas()
    exp = (sil.groupby("repo", as_index=False)
           .agg(n=("repo", "size"), sum_content_bytes=("content_bytes", "sum"))
           .sort_values("repo").reset_index(drop=True))
    got = v.read()
    assert got["repo"].tolist() == exp["repo"].tolist()
    assert got["n"].astype("int64").tolist() == exp["n"].tolist()
    assert got["sum_content_bytes"].astype("int64").tolist() == \
        exp["sum_content_bytes"].tolist()


def test_incremental_view_crash_mid_commit_recovers(ray_session, tmp_path):
    """A refresh interrupted after writing its version dir but BEFORE the
    LATEST pointer flip must rerun and converge (regression for the
    two-rename double-apply hazard): garbage in the future vdir is
    overwritten, nothing double-applies."""
    import os

    d = str(tmp_path / "stream")
    generate_events(d, n_events=1600, n_repos=6, n_epochs=2, seed=41)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d)
    v = IncrementalAggView(r, "inc", ["lang"], ["content_bytes"])
    v.refresh(to_epoch=0)
    # simulate the crashed refresh-to-epoch-1: its vdir exists (corrupt),
    # LATEST still points at v0
    vdir = os.path.join(v.dir, f"v{1:010d}")
    os.makedirs(vdir)
    open(os.path.join(vdir, "data.parquet"), "w").write("garbage")
    open(os.path.join(vdir, "meta.json"), "w").write("{}")
    assert v.view_epoch() == 0
    out = v.refresh(to_epoch=1)
    assert out["status"] == "refreshed"
    _eq(v.read(), _full(r) if r.silver.latest_manifest().epoch == 1 else
        v.read())  # epoch 1 == latest here (2 epochs: 0,1)
    _eq(v.read(), _full(r))


def test_incremental_view_randomized_adversarial(ray_session, tmp_path):
    """Adversarial tiny streams: explicit tombstones (group-count −1), keys
    whose group MOVES between epochs (lang flips — the −pre/+post transfer),
    re-upserts after delete, and duplicate events. Every epoch's refreshed
    state must equal the full recompute."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    rng = random.Random(1234)
    for trial in range(3):
        keys = [("r%d" % (i % 3), "p%d" % i) for i in range(8)]
        epochs = []
        for e in range(3):
            rows = []
            for _ in range(20):
                repo, path = rng.choice(keys)
                if rng.random() < 0.2:
                    rows.append((repo, path, f"c{e:06d}{rng.randrange(999999):06d}",
                                 "", TOMBSTONE))
                else:
                    lang = rng.choice(["py", "rs", "go"])  # group moves
                    rows.append((repo, path, f"c{e:06d}{rng.randrange(999999):06d}",
                                 lang, "x" * rng.randrange(1, 30)))
            epochs.append(rows)
        d = str(tmp_path / f"s{trial}")
        import os
        os.makedirs(d)
        for e, rows in enumerate(epochs):
            t = pa.table({
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "commit": pa.array([r[2] for r in rows], pa.string()),
                "lang": pa.array([r[3] for r in rows], pa.string()),
                "content": pa.array([r[4] for r in rows], pa.large_string()),
            })
            pq.write_table(t, os.path.join(d, f"part-{e:05d}.parquet"))
        r = CDCReplay(str(tmp_path / f"lake{trial}"),
                      EngineConfig(num_partitions=4))
        r.setup()
        v = IncrementalAggView(r, "adv", ["lang"], ["content_bytes"])
        for _ in range(3):
            r.run(d, max_epochs=1)
            v.refresh()
            _eq(v.read(), _full(r))


def test_incremental_view_max_with_delete_recompute(ray_session, tmp_path):
    """MAX is not self-maintainable: deleting the current maximum forces a
    group-scoped recompute. Adversarial stream with tombstones that remove
    group maxima, re-inserts, and group moves — the hybrid IVM (incremental
    on inserts, bounded recompute on max-invalidating deletes) must equal
    the full recompute after every epoch."""
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    rng = random.Random(99)
    keys = [("r%d" % (i % 3), "p%d" % i) for i in range(10)]
    d = str(tmp_path / "s")
    os.makedirs(d)
    for e in range(3):
        rows = []
        for _ in range(25):
            repo, path = rng.choice(keys)
            if rng.random() < 0.25:
                rows.append((repo, path,
                             f"c{e:06d}{rng.randrange(999999):06d}",
                             "", TOMBSTONE))
            else:
                rows.append((repo, path,
                             f"c{e:06d}{rng.randrange(999999):06d}",
                             rng.choice(["py", "rs"]),
                             "x" * rng.randrange(1, 200)))
        t = pa.table({
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.large_string()),
        })
        pq.write_table(t, os.path.join(d, f"part-{e:05d}.parquet"))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = IncrementalAggView(r, "mx", ["lang"], sum_cols=["content_bytes"],
                           max_cols=["content_bytes"],
                           min_cols=["content_bytes"])
    for _ in range(3):
        r.run(d, max_epochs=1)
        v.refresh()
        got = v.read()
        sil = r.read_silver().to_pandas()
        if not len(sil):
            assert not len(got)
            continue
        exp = (sil.groupby("lang", as_index=False)
               .agg(n=("lang", "size"),
                    sum_content_bytes=("content_bytes", "sum"),
                    max_content_bytes=("content_bytes", "max"),
                    min_content_bytes=("content_bytes", "min"))
               .sort_values("lang").reset_index(drop=True))
        assert got["lang"].tolist() == exp["lang"].tolist()
        assert got["n"].astype("int64").tolist() == exp["n"].tolist()
        assert got["sum_content_bytes"].astype("int64").tolist() == \
            exp["sum_content_bytes"].tolist()
        assert got["max_content_bytes"].astype("int64").tolist() == \
            exp["max_content_bytes"].tolist()
        assert got["min_content_bytes"].astype("int64").tolist() == \
            exp["min_content_bytes"].tolist()


def _mini_stream(tmp_path, epochs):
    """epochs = list of row lists (repo, path, commit, lang, content,
    size_hint_or_None) — explicit extra column exercises null extrema."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "mini")
    os.makedirs(d)
    for e, rows in enumerate(epochs):
        t = pa.table({
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.large_string()),
            "size_hint": pa.array([r[5] for r in rows], pa.int64()),
        })
        pq.write_table(t, f"{d}/part-{e:05d}.parquet")
    return d


def test_incremental_view_max_recompute_pins_epoch(ray_session, tmp_path):
    """The max-invalidating recompute must read silver AS OF the refresh's
    epoch: a backfill refresh(to_epoch=1) after epoch 2 committed must
    report epoch 1's max, not the live one."""
    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    d = _mini_stream(tmp_path, [
        [("r", "A", "c000000000001", "py", "aaaaa", 5),
         ("r", "B", "c000000000002", "py", "bbb", 3)],
        [("r", "A", "c000000000003", "", TOMBSTONE, None)],   # delete the max
        [("r", "C", "c000000000004", "py", "c" * 100, 100)],  # later bigger
    ])
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d)  # all three epochs committed
    v = IncrementalAggView(r, "pin", ["lang"], max_cols=["size_hint"])
    v.refresh(to_epoch=0)
    assert v.read()["max_size_hint"].tolist() == [5.0]
    v.refresh(to_epoch=1)  # delete fired the recompute — must pin epoch 1
    assert v.read()["max_size_hint"].tolist() == [3.0]
    v.refresh()
    assert v.read()["max_size_hint"].tolist() == [100.0]


def test_incremental_view_max_null_survivors(ray_session, tmp_path):
    """Deleting the group's only non-null extremum leaves survivors whose
    values are all NULL — the stored max must become NULL, not keep the
    deleted value forever."""
    import numpy as np

    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    d = _mini_stream(tmp_path, [
        [("r", "A", "c000000000001", "py", "aaaaa", 7),
         ("r", "B", "c000000000002", "py", "bbb", None)],
        [("r", "A", "c000000000003", "", TOMBSTONE, None)],
    ])
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d, max_epochs=1)
    v = IncrementalAggView(r, "nullmax", ["lang"], max_cols=["size_hint"])
    v.refresh()
    assert v.read()["max_size_hint"].tolist() == [7.0]
    r.run(d)
    v.refresh()
    got = v.read()
    assert got["n"].tolist() == [1]  # B survives
    assert np.isnan(got["max_size_hint"].iloc[0])
