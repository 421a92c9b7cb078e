"""Event-time watermark / allowed-lateness (reference parity: the reference
declares ``watermark_delay: "10 minutes"`` in models/config.py:46 but never
wires it — we implement the Spark ``withWatermark`` semantics it names).

Contract under test:
- the watermark floor for epoch e is (max event time over epochs < e) −
  ``watermark_delay`` — an epoch's OWN rows never tighten their own bound,
  so within-epoch disorder is always admitted;
- rows older than the floor are dropped before any quality check, land in
  the quarantine dead-letter table with reason="late" when that sink is on,
  and the surviving state equals the oracle replay of the stream WITHOUT
  the late rows;
- with the knob off the same stream applies every row (control);
- the watermark is persisted in the bronze manifest stats (monotone
  ``max_`` merge), so it survives restart/resume.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.oracle import replay_files
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay

from tests.test_e2e_replay import _assert_matches_oracle


def _mk_row(schema: pa.Schema, repo: str, path: str, commit: str) -> pa.Table:
    return pa.table({
        "repo": pa.array([repo], pa.string()),
        "path": pa.array([path], pa.string()),
        "commit": pa.array([commit], pa.string()),
        "lang": pa.array(["py"], pa.string()),
        "content": pa.array([f"body of {repo}/{path}@{commit}"],
                            pa.large_string()),
    }).cast(schema)


def _streams(tmp_path):
    """clean 2-epoch stream + a dirty copy whose epoch-1 file carries one
    LATE row (event time 0 ≪ epoch-0 max − delay) under a brand-new key,
    and one merely-disordered row (below epoch 1's own max but above the
    floor) that must be admitted."""
    clean = str(tmp_path / "clean")
    # p_delay=0: the generator's delivery-fault rows (pushed into the next
    # epoch) would THEMSELVES be late under a tight delay — correct watermark
    # behavior, but this test wants exactly one late row, the planted one
    files = generate_events(clean, n_events=1200, n_repos=6, n_epochs=2,
                            seed=7, p_delay=0.0)
    t1 = pq.read_table(files[1])
    max0 = max(pq.read_table(files[0]).column("commit").to_pylist())
    floor_probe = int(max0[1:]) - 10  # delay used by the tests below
    # disordered-but-on-time: event time = floor (>= floor → kept)
    ontime = _mk_row(t1.schema, "repo-ontime", "p", f"c{floor_probe:012d}")
    late = _mk_row(t1.schema, "repo-late", "p", "c000000000000")
    dirty = str(tmp_path / "dirty")
    os.makedirs(dirty)
    import shutil

    shutil.copy(files[0], dirty)
    dirty_f1 = os.path.join(dirty, os.path.basename(files[1]))
    pq.write_table(pa.concat_tables([t1, late, ontime]), dirty_f1)
    dirty_files = [os.path.join(dirty, os.path.basename(f)) for f in files]
    # the oracle for the WATERMARKED run: the same stream minus the late row
    nolate = str(tmp_path / "nolate")
    os.makedirs(nolate)
    shutil.copy(files[0], nolate)
    pq.write_table(pa.concat_tables([t1, ontime]),
                   os.path.join(nolate, os.path.basename(files[1])))
    nolate_files = [os.path.join(nolate, os.path.basename(f)) for f in files]
    return dirty, dirty_files, nolate_files


def test_watermark_drops_late_admits_disorder(ray_session, tmp_path):
    dirty, dirty_files, nolate_files = _streams(tmp_path)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=10,
                               quarantine_rejects=True))
    r.setup()
    out = r.run(dirty)
    assert out["epochs_run"] == 2
    sil = r.read_silver().to_pandas()
    keys = set(zip(sil["repo"], sil["path"]))
    assert ("repo-late", "p") not in keys, "late row must be dropped"
    assert ("repo-ontime", "p") in keys, "within-lateness disorder admitted"
    # the full state equals the oracle replay of the stream minus the late row
    _assert_matches_oracle(r, replay_files(nolate_files))
    # dead-letter audit trail
    q = r.read_quarantine().to_pandas()
    lateq = q[q["reject_reason"] == "late"]
    assert len(lateq) == 1 and lateq["repo"].iloc[0] == "repo-late"
    # the watermark state is persisted and monotone
    met = r.bronze.latest_manifest().stats["max_event_time"]
    assert met >= int(max(pq.read_table(dirty_files[1])
                          .column("commit").to_pylist())[1:])
    # rerun is still exactly-once (no duplicate quarantine rows, same state)
    assert r.run(dirty)["epochs_run"] == 0
    assert (r.read_quarantine().to_pandas()["reject_reason"] == "late").sum() == 1


def test_watermark_off_admits_everything(ray_session, tmp_path):
    dirty, dirty_files, _ = _streams(tmp_path)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(dirty)
    keys = set(zip(*[r.read_silver().to_pandas()[c] for c in ("repo", "path")]))
    assert ("repo-late", "p") in keys
    _assert_matches_oracle(r, replay_files(dirty_files))


def test_watermark_survives_resume(ray_session, tmp_path):
    """Epoch-at-a-time runs (fresh CDCReplay objects — a restart between
    epochs) enforce the same floor as one continuous run: the watermark
    lives in the manifest, not in memory."""
    dirty, dirty_files, nolate_files = _streams(tmp_path)
    cfg = EngineConfig(num_partitions=4, watermark_delay=10)
    lake = str(tmp_path / "lake")
    CDCReplay(lake, cfg).setup()
    r1 = CDCReplay(lake, cfg)
    r1.run(dirty, max_epochs=1)
    r2 = CDCReplay(lake, cfg)  # fresh process analogue
    r2.run(dirty)
    sil = r2.read_silver().to_pandas()
    assert ("repo-late", "p") not in set(zip(sil["repo"], sil["path"]))
    _assert_matches_oracle(r2, replay_files(nolate_files))


import pytest


@pytest.mark.parametrize("seed,delay", [(101, 150), (202, 40), (303, 700)])
def test_watermark_matches_filtered_oracle_randomized(ray_session, tmp_path,
                                                      seed, delay):
    """Semantic fuzz: on a stream WITH generator delivery faults (rows
    delayed into later epochs), the engine under watermark_delay=d must
    equal the dict-oracle replay of the stream filtered by the SAME rule —
    per epoch, drop rows whose event time < (max event time over PRIOR
    epochs) − d, an epoch's own rows never tightening their own bound."""
    import pyarrow.parquet as pq

    d = str(tmp_path / "s")
    files = generate_events(d, n_events=1500, n_repos=7, n_epochs=3,
                            seed=seed, p_delay=0.15)
    # mirror the floor rule on the raw files
    kept_dir = str(tmp_path / "kept")
    os.makedirs(kept_dir)
    running_max = None
    kept_files = []
    for f in files:
        t = pq.read_table(f)
        ets = [int(c[1:]) for c in t.column("commit").to_pylist()]
        if running_max is None:
            keep = t
        else:
            floor = running_max - delay
            mask = pa.array([e >= floor for e in ets])
            keep = t.filter(mask)
        running_max = max([running_max or -1] + ets)
        out = os.path.join(kept_dir, os.path.basename(f))
        pq.write_table(keep, out)
        kept_files.append(out)

    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=delay))
    r.setup()
    r.run(d)
    _assert_matches_oracle(r, replay_files(kept_files))


def test_null_event_time_is_not_late(ray_session, tmp_path):
    """Input-supplied event_time with a NULL on an otherwise valid row: the
    row must survive the watermark filter (null is not late) instead of
    vanishing into the null comparison, and must not be quarantined."""
    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=800, n_repos=5, n_epochs=2, seed=21,
                            p_delay=0.0)
    # supply event_time explicitly: epoch index * 1000 + row, one NULL row
    for ei, f in enumerate(files):
        t = pq.read_table(f)
        et = [ei * 100_000 + i for i in range(t.num_rows)]
        t = t.append_column("event_time", pa.array(et, pa.int64()))
        pq.write_table(t, f)
    t1 = pq.read_table(files[1])
    nullrow = _mk_row(t1.schema.remove(t1.schema.get_field_index("event_time")),
                      "repo-nullet", "p", "c000000000042")
    nullrow = nullrow.append_column("event_time",
                                    pa.array([None], pa.int64()))
    pq.write_table(pa.concat_tables([t1, nullrow]), files[1])

    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=10,
                               quarantine_rejects=True))
    r.setup()
    r.run(d)
    sil = r.read_silver().to_pandas()
    assert ("repo-nullet", "p") in set(zip(sil["repo"], sil["path"]))
    q = r.read_quarantine().to_pandas()
    if len(q):
        assert "repo-nullet" not in set(q["repo"])


def test_dml_feed_applies_to_old_keys_under_watermark(ray_session, tmp_path):
    """GDPR-erasure regression: on a watermark-enabled lake, a tombstone/
    update feed for a key whose winning commit is OLDER than the watermark
    floor must still apply — the feed ships an explicit event_time pinned to
    the current stream max (the stamper lets a source event_time win), so
    the validator never drops the DML as 'late'. Without that column the
    stamper would derive event_time from the bumped old commit and the
    delete would silently never happen."""
    d = str(tmp_path / "stream")
    os.makedirs(d)
    schema = pa.schema([
        pa.field("repo", pa.string()), pa.field("path", pa.string()),
        pa.field("commit", pa.string()), pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ])
    # epoch 0: the victim commits early (event time 10), peers at ~100
    e0 = pa.concat_tables([
        _mk_row(schema, "repo-old", "p", "c000000000010"),
        _mk_row(schema, "repo-a", "p", "c000000000100"),
    ])
    pq.write_table(e0, os.path.join(d, "part-00000.parquet"))
    # epoch 1: the stream races ahead → floor = 1000 - 50 ≫ 11
    e1 = _mk_row(schema, "repo-a", "q", "c000000001000")
    pq.write_table(e1, os.path.join(d, "part-00001.parquet"))

    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=50))
    r.setup()
    r.run(d)
    sil = r.read_silver(columns=["repo", "path"]).to_pandas()
    assert ("repo-old", "p") in set(zip(sil["repo"], sil["path"]))

    out = r.make_tombstones(("repo", "==", "repo-old"),
                            os.path.join(d, "part-00002.feed"))
    assert out["tombstones"] == 1
    feed_parts = sorted(
        __import__("glob").glob(os.path.join(out["out"], "*.parquet")))
    feed = pq.read_table(feed_parts[0])
    assert "event_time" in feed.column_names  # pinned ≥ the watermark
    assert feed.column("event_time")[0].as_py() >= 1000 - 50
    assert r.run(d)["epochs_run"] == 1
    sil2 = r.read_silver(columns=["repo", "path"]).to_pandas()
    assert ("repo-old", "p") not in set(zip(sil2["repo"], sil2["path"]))

    # same guarantee for the UPDATE feed on another old key
    out2 = r.make_updates(("repo", "==", "repo-a"), {"lang": "zz"},
                          os.path.join(d, "part-00003.feed"))
    assert out2["updates"] == 2
    assert r.run(d)["epochs_run"] == 1
    sil3 = r.read_silver(columns=["repo", "lang"]).to_pandas()
    assert set(sil3[sil3["repo"] == "repo-a"]["lang"]) == {"zz"}
