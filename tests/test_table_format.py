"""Manifest / two-phase-commit lake table invariants."""

import os

import pyarrow as pa
import pytest

from maritime_activity_reports_cdc_ray.state.table import LakeTable, union_schemas

SCHEMA = pa.schema([("k", pa.string()), ("v", pa.int64())])


def _t(rows):
    return pa.table({"k": [r[0] for r in rows], "v": [r[1] for r in rows]}, schema=SCHEMA)


def test_create_and_commit(tmp_path):
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    m = lake.latest_manifest()
    assert m.epoch == -1 and m.version == 0 and m.schema.equals(SCHEMA)
    f = lake.stage_fragment(_t([("a", 1)]), epoch=0, pid=0, salt=0, kind="current")
    m = lake.commit_epoch(0, [f], lineage=[{"epoch": 0}], stats_delta={"rows": 1})
    assert m.epoch == 0 and m.version == 1 and len(m.fragments) == 1
    assert m.stats == {"rows": 1}
    assert os.path.exists(str(tmp_path / "t" / "_lineage" / "epoch-0.json"))


def test_commit_idempotent(tmp_path):
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current")
    m1 = lake.commit_epoch(0, [f], stats_delta={"rows": 1})
    # replaying the same epoch commit is a no-op (exactly-once)
    m2 = lake.commit_epoch(0, [f], stats_delta={"rows": 1})
    assert m2.version == m1.version and m2.stats == {"rows": 1}


def test_replace_and_vacuum(tmp_path):
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f0 = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current")
    lake.commit_epoch(0, [f0])
    f1 = lake.stage_fragment(_t([("a", 2)]), 1, 0, 0, "current")
    m = lake.commit_epoch(1, [f1], replaced={f0.path})
    assert [fr.path for fr in m.fragments] == [f1.path]
    assert os.path.exists(lake.abspath(f0.path))  # still on disk pre-vacuum
    removed = lake.vacuum()
    assert removed >= 1 and not os.path.exists(lake.abspath(f0.path))
    assert os.path.exists(lake.abspath(f1.path))


def test_staging_overwrite_is_atomic(tmp_path):
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    a = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current")
    b = lake.stage_fragment(_t([("a", 1), ("b", 2)]), 0, 0, 0, "current")
    assert a.path == b.path and b.rows == 2  # deterministic path, overwrite


def test_maintenance_commit_keeps_epoch(tmp_path):
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f0 = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current")
    lake.commit_epoch(0, [f0])
    f1 = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current", suffix="rs")
    m = lake.commit_maintenance([f1], {f0.path}, salt_map={"0": 2})
    assert m.epoch == 0 and m.version == 2 and m.salt_map == {"0": 2}


def test_union_schemas():
    s1 = pa.schema([("a", pa.string()), ("b", pa.int64())])
    s2 = pa.schema([("a", pa.string()), ("c", pa.float64())])
    u = union_schemas(s1, s2)
    assert u.names == ["a", "b", "c"]
    with pytest.raises(ValueError):
        union_schemas(s1, pa.schema([("b", pa.string())]))
    # string/large_string widening allowed
    union_schemas(pa.schema([("a", pa.string())]), pa.schema([("a", pa.large_string())]))


def test_reference_data_readers(ray_session, tmp_path):
    """S1/S2 extension-dispatched readers (JSON + CSV + Parquet)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from maritime_activity_reports_cdc_ray.sources.readers import (
        read_events,
        read_reference_data,
    )

    df = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "ref.parquet")
    df.to_json(tmp_path / "ref.json", orient="records", lines=True)
    df.to_csv(tmp_path / "ref.csv", index=False)
    for name in ("ref.parquet", "ref.json", "ref.csv"):
        got = read_reference_data(str(tmp_path / name)).to_pandas()
        assert got.sort_values("k").v.tolist() == ["a", "b", "c"], name
    with _pytest.raises(ValueError):
        read_reference_data(str(tmp_path / "ref.xml"))
    ev = read_events(str(tmp_path / "ref.parquet"), columns=["k"]).to_pandas()
    assert list(ev.columns) == ["k"]


def test_overwrite_full_refresh(ray_session, tmp_path):
    """S4: mode('overwrite') + overwriteSchema analogue — one manifest swap
    replaces all contents; vacuum reclaims the old fragments."""
    import ray.data as rd

    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f = lake.stage_fragment(_t([("a", 1), ("b", 2)]), 0, 0, 0, "data")
    lake.commit_epoch(0, [f])
    # pa.Table refresh with a NEW schema (overwriteSchema)
    s2 = pa.schema([("k", pa.string()), ("v", pa.int64()), ("z", pa.string())])
    m = lake.overwrite(pa.table({"k": ["x"], "v": [9], "z": ["Z"]}, schema=s2))
    assert m.epoch == 0  # watermark preserved
    assert m.schema.equals(s2)
    assert [f.rows for f in m.fragments] == [1]
    assert m.stats.get("overwrites") == 1
    # Dataset refresh (streamed, fragment per block)
    ds = rd.from_arrow(pa.table({"k": ["p", "q"], "v": [1, 2], "z": ["a", "b"]}, schema=s2))
    m = lake.overwrite(ds)
    assert sum(f.rows for f in m.fragments) == 2
    assert m.schema.names == ["k", "v", "z"]
    # old files are gone after vacuum; live data intact
    assert lake.vacuum() > 0
    import pyarrow.parquet as pq

    live = pa.concat_tables([pq.read_table(p) for p in lake.all_fragment_paths(m)])
    assert sorted(live.column("k").to_pylist()) == ["p", "q"]


def test_overwrite_empty_keeps_schema(tmp_path):
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "data")
    lake.commit_epoch(0, [f])
    m = lake.overwrite(pa.table({"k": pa.array([], pa.string()),
                                 "v": pa.array([], pa.int64())}, schema=SCHEMA))
    assert m.schema.equals(SCHEMA) and sum(fr.rows for fr in m.fragments) == 0


def test_write_partitioned_resumable(ray_session, tmp_path):
    """Resumable partitioned output: finished partitions (sentinel present)
    are skipped at the batch level on rerun; missing partitions backfill."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.sources.writers import write_partitioned

    df = pd.DataFrame({"lang": ["en"] * 30 + ["de"] * 20 + ["fr"] * 10,
                       "x": range(60)})
    root = str(tmp_path / "out")
    r1 = write_partitioned(rd.from_pandas(df), root, by="lang")
    assert r1 == {"partitions_written": 3, "partitions_skipped": 0, "rows": 60}
    for lang, n in (("en", 30), ("de", 20), ("fr", 10)):
        d = os.path.join(root, f"lang={lang}")
        assert os.path.exists(os.path.join(d, "_SUCCESS"))
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert sum(pq.read_metadata(os.path.join(d, f)).num_rows for f in files) == n

    # simulate a crash that lost one partition: no sentinel, no files
    import shutil

    shutil.rmtree(os.path.join(root, "lang=de"))
    before = {f: os.path.getmtime(os.path.join(root, "lang=en", f))
              for f in os.listdir(os.path.join(root, "lang=en"))}
    r2 = write_partitioned(rd.from_pandas(df), root, by="lang")
    assert r2["partitions_written"] == 1 and r2["partitions_skipped"] == 2
    assert r2["rows"] == 20  # only the missing partition's rows were written
    after = {f: os.path.getmtime(os.path.join(root, "lang=en", f))
             for f in os.listdir(os.path.join(root, "lang=en"))}
    assert before == after  # finished partitions untouched
    total = rd.read_parquet(root).count()
    assert total == 60


def test_write_partitioned_clears_crashed_partition(ray_session, tmp_path):
    """A partition dir left WITH files but WITHOUT _SUCCESS (mid-write crash)
    must be cleared before the rewrite — otherwise differently-split batches
    produce differently-named files and old+new rows coexist."""
    import os

    import pandas as pd
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.sources.writers import write_partitioned

    df = pd.DataFrame({"lang": ["en"] * 10 + ["de"] * 10, "x": range(20)})
    root = str(tmp_path / "out")
    write_partitioned(rd.from_pandas(df), root, by="lang")
    # forge the crash state: sentinel gone, stale extra file present
    d = os.path.join(root, "lang=de")
    os.unlink(os.path.join(d, "_SUCCESS"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"lang": ["de"], "x": [999]}),
                   os.path.join(d, "part-deadbeef-1.parquet"))
    r = write_partitioned(rd.from_pandas(df), root, by="lang")
    assert r["partitions_written"] == 1 and r["partitions_skipped"] == 1
    back = rd.read_parquet(root).to_pandas()
    assert len(back) == 20 and 999 not in set(back.x)


def test_commit_is_put_if_absent(tmp_path):
    """Optimistic concurrency: a second writer targeting an already-taken
    manifest version must fail with ConcurrentCommitError (not silently
    replace the winner), while a byte-identical retry of the SAME commit is
    accepted (idempotent). The winner's manifest survives either way."""
    import dataclasses

    from maritime_activity_reports_cdc_ray.schemas import SILVER_CURRENT_SCHEMA
    from maritime_activity_reports_cdc_ray.state.table import (
        ConcurrentCommitError,
        LakeTable,
    )

    t = LakeTable.create(str(tmp_path / "t"), "t", SILVER_CURRENT_SCHEMA, 4)
    m = t.latest_manifest()
    # writer A commits version m.version+1
    a = dataclasses.replace(m, version=m.version + 1, epoch=m.epoch + 1)
    t._write_manifest(a)
    # idempotent retry of the SAME manifest: accepted
    t._write_manifest(a)
    # writer B lost the race to the same version with DIFFERENT content
    b = dataclasses.replace(m, version=m.version + 1, epoch=m.epoch + 7)
    with pytest.raises(ConcurrentCommitError, match="another writer"):
        t._write_manifest(b)
    # the winner's manifest is untouched
    assert t.latest_manifest().epoch == a.epoch


def test_append_commit_rebases_on_version_race(tmp_path):
    """Two append writers racing to the same manifest VERSION with distinct
    epochs: the loser rebases onto the winner's manifest and both fragment
    sets land. A replace-commit losing the race propagates the conflict."""
    import dataclasses

    from maritime_activity_reports_cdc_ray.schemas import SILVER_CURRENT_SCHEMA
    from maritime_activity_reports_cdc_ray.state.table import (
        ConcurrentCommitError,
        Fragment,
        LakeTable,
    )

    t = LakeTable.create(str(tmp_path / "t"), "t", SILVER_CURRENT_SCHEMA, 4)
    fa = Fragment(path="a.parquet", pid=0, salt=0, kind="data", epoch=1,
                  rows=1, bytes=1)
    fb = Fragment(path="b.parquet", pid=1, salt=0, kind="data", epoch=2,
                  rows=1, bytes=1)
    # writer A wins version 1 out-of-band (simulates the race: B computed
    # its manifest against version 0, then A committed first)
    base = t.latest_manifest()
    winner = dataclasses.replace(base, version=base.version + 1, epoch=1,
                                 fragments=[fa])
    t._write_manifest(winner)
    # writer B's append must rebase onto A's manifest, not fail or clobber
    m2 = t.commit_epoch(2, [fb])
    assert m2.version == winner.version + 1
    assert {f.path for f in m2.fragments} == {"a.parquet", "b.parquet"}
    # a REPLACE commit losing the race must propagate the conflict: pin the
    # version race by pre-committing the version it will target
    taken = dataclasses.replace(m2, version=m2.version + 1, epoch=7)
    t._write_manifest(taken)

    class Pinned(LakeTable):
        # resolve latest as the stale m2 so the replace targets taken.version
        def latest_manifest(self):
            return m2
    p = Pinned(t.root)
    with pytest.raises(ConcurrentCommitError):
        p.commit_epoch(3, [fa], replaced={"b.parquet"})


def test_stale_replay_publishes_no_phantom_lineage(tmp_path):
    """A commit of an epoch <= the watermark is a no-op — it must ALSO not
    overwrite the epoch's lineage side file (phantom lineage for fragments
    that never landed would corrupt gold catch-up / clone lineage copies)."""
    import json

    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f0 = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current")
    lake.commit_epoch(0, [f0], lineage=[{"epoch": 0, "rows_in": 1}])
    lp = str(tmp_path / "t" / "_lineage" / "epoch-0.json")
    with open(lp) as f:
        before = json.load(f)
    # stale replay of epoch 0 with DIFFERENT lineage: no-ops, lineage intact
    f1 = lake.stage_fragment(_t([("a", 1), ("b", 2)]), 0, 1, 0, "current")
    m = lake.commit_epoch(0, [f1], lineage=[{"epoch": 0, "rows_in": 999}])
    assert m.epoch == 0 and len(m.fragments) == 1
    with open(lp) as f:
        assert json.load(f) == before


def test_describe_history_after_vacuum_not_clone(tmp_path):
    """vacuum truncates older manifests; the oldest SURVIVOR has prev=None
    but must not be labeled 'clone' (or 'create') — it is 'unknown'."""
    lake = LakeTable.create(str(tmp_path / "t"), "t", SCHEMA, 4)
    f0 = lake.stage_fragment(_t([("a", 1)]), 0, 0, 0, "current")
    lake.commit_epoch(0, [f0])
    f1 = lake.stage_fragment(_t([("b", 2)]), 1, 1, 0, "current")
    lake.commit_epoch(1, [f1])
    lake.vacuum()
    h = lake.describe_history()
    assert len(h) == 1
    assert h[0]["operation"] == "unknown"
    assert h[0]["version"] == 2


def test_num_partitions_mismatch_fails_fast(tmp_path):
    """Reopening a lake with a different num_partitions must raise a clear
    error at run() — pid assignment derives from cfg, so a mismatch would
    scatter keys across wrong pids (first seen as an IndexError in resalt)."""
    import pytest

    from maritime_activity_reports_cdc_ray import EngineConfig
    from maritime_activity_reports_cdc_ray.generate import generate_events
    from maritime_activity_reports_cdc_ray.pipelines import CDCReplay

    d = str(tmp_path / "stream")
    generate_events(d, n_events=200, n_repos=3, n_epochs=1, seed=1)
    lake = str(tmp_path / "lake")
    CDCReplay(lake, EngineConfig(num_partitions=8)).setup()
    r = CDCReplay(lake, EngineConfig(num_partitions=4))
    with pytest.raises(ValueError, match="num_partitions"):
        r.run(d)
