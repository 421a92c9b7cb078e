"""IncrementalAggView's hash-partitioned state path (scale-proof IVM).

Contract: the partitioned merge (state∪delta per hash partition inside Ray
tasks, IN-list- or semi_join-scoped extrema recompute patched back per
partition, untouched partitions carried over as hard links) is value-
equivalent to the small-state driver merge AND to a full recompute of the
same group-by over silver — across tombstones, group moves, max-invalidating
deletes, restarts, and repeated refreshes.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay
from maritime_activity_reports_cdc_ray.pipelines import views as views_mod
from maritime_activity_reports_cdc_ray.pipelines.views import IncrementalAggView
from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE


def _write_stream(d: str, epochs):
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


def _adversarial_epochs(rng, n_epochs=3, n_keys=24, n_langs=12, per_epoch=60):
    """Tombstones (max-invalidating deletes), group moves, re-upserts."""
    keys = [("r%d" % (i % 5), "p%d" % i) for i in range(n_keys)]
    langs = ["l%02d" % i for i in range(n_langs)]
    epochs = []
    for e in range(n_epochs):
        rows = []
        for _ in range(per_epoch):
            repo, path = rng.choice(keys)
            if rng.random() < 0.25:
                rows.append((repo, path,
                             f"c{e:06d}{rng.randrange(999999):06d}",
                             "", TOMBSTONE))
            else:
                rows.append((repo, path,
                             f"c{e:06d}{rng.randrange(999999):06d}",
                             rng.choice(langs),
                             "x" * rng.randrange(1, 200)))
        epochs.append(rows)
    return epochs


def _full(r) -> pd.DataFrame:
    sil = r.read_silver().to_pandas()
    cols = ["lang", "n", "sum_content_bytes", "max_content_bytes",
            "min_content_bytes"]
    if not len(sil):
        return pd.DataFrame(columns=cols)
    return (sil.groupby("lang", as_index=False)
            .agg(n=("lang", "size"),
                 sum_content_bytes=("content_bytes", "sum"),
                 max_content_bytes=("content_bytes", "max"),
                 min_content_bytes=("content_bytes", "min"))
            .sort_values("lang").reset_index(drop=True))


def _eq(got: pd.DataFrame, exp: pd.DataFrame):
    assert got["lang"].tolist() == exp["lang"].tolist()
    for c in ("n", "sum_content_bytes", "max_content_bytes",
              "min_content_bytes"):
        assert got[c].astype("float64").tolist() == \
            exp[c].astype("float64").tolist(), c


def _mk_view(r, name, **kw):
    return IncrementalAggView(r, name, ["lang"], sum_cols=["content_bytes"],
                              max_cols=["content_bytes"],
                              min_cols=["content_bytes"], **kw)


def test_partitioned_path_matches_driver_and_full(ray_session, tmp_path):
    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(7)))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    vp = _mk_view(r, "part", driver_state_limit=0)   # always partitioned
    vd = _mk_view(r, "drv")                          # always driver (small)
    for _ in range(3):
        r.run(d, max_epochs=1)
        out = vp.refresh()
        assert out["status"] == "refreshed"
        vd.refresh()
        exp = _full(r)
        _eq(vp.read(), exp)
        _eq(vd.read(), exp)
        # exactly-once: an immediate re-refresh is a watermark no-op
        assert vp.refresh()["status"] == "fresh"
        _eq(vp.read(), exp)
    # state is hash-partitioned parquet on disk
    latest = vp._latest()
    parts = vp._part_files(latest)
    assert len(parts) >= 2, "expected multiple hash partitions"


def test_partitioned_semi_join_recompute(ray_session, tmp_path, monkeypatch):
    """Force the semi_join scope (IN-list gate at 0) — the scale path for a
    wide recompute — and keep full-recompute equivalence."""
    monkeypatch.setattr(views_mod, "RECOMPUTE_INLIST_LIMIT", 0)
    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(11)))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    vp = _mk_view(r, "sj", driver_state_limit=0)
    vd = _mk_view(r, "sjd")  # driver path also takes the semi_join branch
    for _ in range(3):
        r.run(d, max_epochs=1)
        vp.refresh()
        vd.refresh()
        exp = _full(r)
        _eq(vp.read(), exp)
        _eq(vd.read(), exp)


def test_partitioned_restart_and_catchup(ray_session, tmp_path):
    """A fresh object over the same lake resumes partitioned state, and a
    view lagging several epochs catches up in ONE partitioned delta."""
    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(23)))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = _mk_view(r, "rs", driver_state_limit=0)
    r.run(d, max_epochs=1)
    v.refresh()
    r.run(d)  # two more epochs while the view sleeps
    v2 = _mk_view(r, "rs", driver_state_limit=0)  # restart analogue
    assert v2.view_epoch() == 0
    out = v2.refresh()
    assert out["status"] == "refreshed"
    _eq(v2.read(), _full(r))


def test_read_guard_raises_past_limit(ray_session, tmp_path, monkeypatch):
    """read() fails LOUDLY past the driver-frame contract; read_dataset()
    remains the scale path."""
    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(31), n_epochs=1))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d)
    v = _mk_view(r, "guard", driver_state_limit=0)
    v.refresh()
    exp = _full(r)
    monkeypatch.setattr(views_mod, "VIEW_READ_DRIVER_LIMIT", 0)
    with pytest.raises(ValueError, match="read_dataset"):
        v.read()
    got = (v.read_dataset().to_pandas()
           .sort_values("lang").reset_index(drop=True))
    _eq(got, exp)


def test_partitioned_untouched_parts_hard_linked(ray_session, tmp_path):
    """A refresh whose delta touches one group must NOT rewrite the other
    partitions' state files — they carry over as hard links (same inode)."""
    # epoch 0: many single-group langs; epoch 1: touch exactly one lang
    e0 = [("r", f"p{i}", f"c000000{i:06d}", f"l{i:02d}", "x" * (i + 1))
          for i in range(32)]
    e1 = [("r", "p0", "c000001000000", "l00", "y" * 7)]
    d = str(tmp_path / "s")
    _write_stream(d, [e0, e1])
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = _mk_view(r, "hl", driver_state_limit=0, num_partitions=8)
    r.run(d, max_epochs=1)
    v.refresh()
    before = {os.path.basename(f): os.stat(f).st_ino
              for f in v._part_files(v._latest())}
    r.run(d)
    v.refresh()
    after = {os.path.basename(f): os.stat(f).st_ino
             for f in v._part_files(v._latest())}
    _eq(v.read(), _full(r))
    unchanged = [b for b in before
                 if b in after and after[b] == before[b]]
    # the single touched group lives in one partition; the rest are links
    assert len(unchanged) >= len(before) - 1
    assert len(unchanged) < len(before)  # the touched one WAS rewritten


def test_partitioned_crash_mid_commit_recovers(ray_session, tmp_path):
    """Garbage from a crashed refresh attempt (vdir written, LATEST not
    flipped) is cleared and the rerun converges — including stale pending
    files that would otherwise trip the leftover guard."""
    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(41), n_epochs=2))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d)
    v = _mk_view(r, "cr", driver_state_limit=0)
    v.refresh(to_epoch=0)
    vdir = os.path.join(v.dir, f"v{1:010d}")
    os.makedirs(os.path.join(vdir, "_pending"))
    open(os.path.join(vdir, "part-00000.parquet"), "w").write("garbage")
    open(os.path.join(vdir, "_pending", "part-00001.parquet"), "w") \
        .write("garbage")
    assert v.view_epoch() == 0
    out = v.refresh(to_epoch=1)
    assert out["status"] == "refreshed"
    _eq(v.read(), _full(r))


def test_partitioned_multi_group_key_with_bystander_patch(ray_session,
                                                          tmp_path):
    """Composite group key (repo, lang): the recompute scope is an IN-list
    on gcols[0] only, so BYSTANDER groups (same repo, different lang) get
    scoped in — patching them must be a value no-op, including bystanders
    living in already-finalized partitions. Randomized tombstones force
    extrema recomputes every epoch."""
    rng = random.Random(53)
    keys = [("r%d" % (i % 4), "p%d" % i) for i in range(20)]
    epochs = []
    for e in range(3):
        rows = []
        for _ in range(50):
            repo, path = rng.choice(keys)
            if rng.random() < 0.3:
                rows.append((repo, path,
                             f"c{e:06d}{rng.randrange(999999):06d}",
                             "", TOMBSTONE))
            else:
                rows.append((repo, path,
                             f"c{e:06d}{rng.randrange(999999):06d}",
                             rng.choice(["py", "rs", "go"]),
                             "x" * rng.randrange(1, 120)))
        epochs.append(rows)
    d = str(tmp_path / "s")
    _write_stream(d, epochs)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = IncrementalAggView(r, "mg", ["repo", "lang"],
                           sum_cols=["content_bytes"],
                           max_cols=["content_bytes"],
                           min_cols=["content_bytes"],
                           driver_state_limit=0, num_partitions=8)
    for _ in range(3):
        r.run(d, max_epochs=1)
        v.refresh()
        got = v.read()
        sil = r.read_silver().to_pandas()
        if not len(sil):
            assert not len(got)
            continue
        exp = (sil.groupby(["repo", "lang"], as_index=False)
               .agg(n=("lang", "size"),
                    sum_content_bytes=("content_bytes", "sum"),
                    max_content_bytes=("content_bytes", "max"),
                    min_content_bytes=("content_bytes", "min"))
               .sort_values(["repo", "lang"]).reset_index(drop=True))
        assert got[["repo", "lang"]].values.tolist() == \
            exp[["repo", "lang"]].values.tolist()
        for c in ("n", "sum_content_bytes", "max_content_bytes",
                  "min_content_bytes"):
            assert got[c].astype("float64").tolist() == \
                exp[c].astype("float64").tolist(), c


def test_legacy_single_file_state_migrates(ray_session, tmp_path):
    """A state persisted by the PRE-partitioned layout (v*/data.parquet,
    meta without num_partitions) must be read, merged and rewritten in the
    new layout — never silently treated as empty (which would merge the
    delta into nothing and destroy the history)."""
    import json

    import pyarrow.parquet as pq

    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(61)))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    v = _mk_view(r, "lg")
    r.run(d, max_epochs=1)
    v.refresh()
    state_now = v.read()
    # rewrite the committed version as the LEGACY layout
    vdir = v._latest()
    for f in v._part_files(vdir):
        os.unlink(f)
    pq.write_table(pa.Table.from_pandas(state_now, preserve_index=False),
                   os.path.join(vdir, "data.parquet"))
    meta = json.load(open(os.path.join(vdir, "meta.json")))
    meta.pop("num_partitions", None)
    json.dump(meta, open(os.path.join(vdir, "meta.json"), "w"))
    _eq(v.read(), state_now)  # legacy fallback read works
    # next refresh merges ON TOP of the legacy state and migrates the layout
    r.run(d)
    # driver_state_limit=0 would normally force the partitioned path — the
    # legacy guard must override it
    v2 = _mk_view(r, "lg", driver_state_limit=0)
    v2.refresh()
    _eq(v2.read(), _full(r))
    assert any("part-" in os.path.basename(f)
               for f in v2._part_files(v2._latest()))
    meta2 = json.load(open(os.path.join(v2._latest(), "meta.json")))
    assert "num_partitions" in meta2  # migrated


def test_refresh_with_empty_delta_and_extrema(ray_session, tmp_path,
                                              monkeypatch):
    """An epoch range whose net change feed is EMPTY (Ray 2.49 strips the
    schema from the all-empty delta) must advance the watermark as a no-op
    on both paths — not KeyError on the missing _ins_ext columns."""
    import ray.data as rd

    d = str(tmp_path / "s")
    _write_stream(d, _adversarial_epochs(random.Random(67), n_epochs=2))
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d, max_epochs=1)
    views = [_mk_view(r, "edd"), _mk_view(r, "edp", driver_state_limit=0)]
    for v in views:
        v.refresh()
    r.run(d)  # epoch 1 commits while both views sleep
    monkeypatch.setattr(r, "table_changes",
                        lambda *a, **k: rd.from_pandas(pd.DataFrame()))
    for v in views:
        before = v.read()
        out = v.refresh()
        assert out["status"] == "refreshed" and out["groups_touched"] == 0
        _eq(v.read(), before)  # no-op state carry, watermark advanced
        assert v.view_epoch() == r.silver.latest_manifest().epoch
