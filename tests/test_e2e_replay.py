"""End-to-end Ray replay: oracle equality, exactly-once resume, skew salting,
schema evolution (the keystone tests of SURVEY.md §5)."""

import json
import os

import pyarrow as pa
import pytest

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.oracle import replay_files
from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay


def _collect(ds):
    """Driver-collect as pandas via Arrow — ``Dataset.to_pandas()`` trips
    Ray's TensorArray cast on ragged nested (list/struct) columns;
    ``pa.Table.to_pandas`` handles them as plain objects."""
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches).to_pandas() if batches else ds.to_pandas()


def _assert_matches_oracle(replay: CDCReplay, oracle):
    exp_s = oracle.expected_silver()
    sil = _collect(replay.read_silver())
    eng_s = {
        (r.repo, r.path): (r.commit, r.lang, r.content_sha256, r.version_count)
        for r in sil.itertuples()
    }
    assert set(eng_s) == set(exp_s)
    for k, v in exp_s.items():
        assert eng_s[k] == (v["commit"], v["lang"], v["content_sha256"], v["version_count"]), k
    exp_g = oracle.expected_gold()
    gold = replay.read_gold().to_pandas()
    assert len(gold) == len(exp_g)
    for r in gold.itertuples():
        a = exp_g[r.repo]
        assert int(r.file_count) == a["file_count"]
        assert r.latest_commit == a["latest_commit"]
        assert int(r.total_bytes) == a["total_bytes"]
        assert int(r.deleted_count) == a["deleted_count"]
        assert int(r.total_versions) == a["total_versions"]
        assert r.repo_sha256 == a["repo_sha256"], r.repo
        assert sorted((d["lang"], int(d["n"])) for d in r.lang_counts) == [
            (l, n) for l, n in a["lang_counts"]
        ]
    assert replay.read_history().count() == oracle.history_rows


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    files = generate_events(str(d), n_events=4000, n_repos=15, n_epochs=4, seed=42)
    return str(d), files, replay_files(files)


def test_full_replay_matches_oracle(ray_session, stream, tmp_path):
    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    out = r.run(src)
    assert out["epochs_run"] == 4
    assert out["silver_epoch"] == 3 and out["gold_epoch"] == 3
    _assert_matches_oracle(r, oracle)
    # lineage recorded per epoch with merge stats
    lp = os.path.join(r.silver.root, "_lineage", "epoch-0.json")
    lineage = json.load(open(lp))
    assert sum(x["rows_in"] for x in lineage) > 0
    assert all({"pid", "salt", "rows_applied", "changed_repos"} <= set(x) for x in lineage)


def test_resume_after_partial_epoch(ray_session, stream, tmp_path):
    """Crash between bronze and silver commits of an epoch → rerun converges
    to the identical state (idempotent two-phase commit)."""
    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src, max_epochs=2)
    assert r.silver.latest_manifest().epoch == 1
    # simulate crash: bronze of epoch 2 committed, silver/gold not
    r._bronze_ingest(2, [files[2]])
    assert r.bronze.latest_manifest().epoch == 2
    assert r.silver.latest_manifest().epoch == 1
    # fresh driver resumes and completes
    r2 = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    out = r2.run(src)
    assert out["silver_epoch"] == 3
    _assert_matches_oracle(r2, oracle)


def test_rerun_is_noop(ray_session, stream, tmp_path):
    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    v = r.silver.latest_manifest().version
    out = r.run(src)  # replay again: watermark says everything is committed
    assert out["epochs_run"] == 0
    assert r.silver.latest_manifest().version == v
    _assert_matches_oracle(r, oracle)


def test_skew_salting_engages(ray_session, tmp_path):
    """One mega-repo dominating the stream trips hot-partition detection; the
    salted layout still converges to the oracle state."""
    d = str(tmp_path / "skewed")
    files = generate_events(d, n_events=6000, n_repos=3, n_epochs=3, seed=11, zipf_s=3.0)
    oracle = replay_files(files)
    cfg = EngineConfig(num_partitions=2, hot_partition_rows=500, max_salt=8)
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(d)
    sm = r.silver.latest_manifest()
    assert sm.salt_map, "hot partition should have been salted"
    salted_pid = int(next(iter(sm.salt_map)))
    salted = [f for f in sm.fragments if f.kind == "current" and f.pid == salted_pid]
    assert len({f.salt for f in salted}) > 1, "current fragments should be salt-sliced"
    _assert_matches_oracle(r, oracle)


def test_schema_evolution_e2e(ray_session, tmp_path):
    d = str(tmp_path / "evolve")
    files = generate_events(d, n_events=2000, n_repos=6, n_epochs=3, seed=5,
                            schema_evolve_from_epoch=1)
    oracle = replay_files(files)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d)
    sm = r.silver.latest_manifest()
    assert "size_hint" in sm.schema.names  # additive evolution reached silver
    _assert_matches_oracle(r, oracle)
    # evolved column is readable with nulls backfilled for pre-evolution rows
    sil = r.read_silver(live_only=False).to_pandas()
    assert "size_hint" in sil.columns


def test_nested_payload_e2e(ray_session, tmp_path):
    """List- and struct-typed payload columns through the full chain:
    stamp → merge → SCD2 → CDF → schema evolution → parquet round-trip.

    The reference's silver schema carries ARRAY<STRING>
    (silver/table_setup.py:197); this engine's evolved-payload path must be
    type-generic, not scalar-only. The generator evolves ``tags``
    (list<string>) and ``meta`` (struct<author,stars>) in from epoch 1; the
    dict oracle replays the same values (oracle.py KeyState.extra)."""
    import numpy as np
    import pyarrow.parquet as pq

    from maritime_activity_reports_cdc_ray.generate import (NESTED_META_TYPE,
                                                            NESTED_TAGS_TYPE)

    d = str(tmp_path / "nested")
    files = generate_events(d, n_events=2500, n_repos=8, n_epochs=3, seed=7,
                            nested_payload_from_epoch=1)
    oracle = replay_files(files)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d)

    # nested additive evolution reached the silver manifest schema
    sm = r.silver.latest_manifest()
    assert sm.schema.field("tags").type == NESTED_TAGS_TYPE
    assert sm.schema.field("meta").type == NESTED_META_TYPE
    _assert_matches_oracle(r, oracle)

    def norm_tags(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return list(v)

    # per-key nested values match the dict-replay oracle (pre-evolution
    # winners null-backfilled; tombstoned-then-reinserted keys rebuilt)
    exp = oracle.expected_silver()
    sil = _collect(r.read_silver(columns=["repo", "path", "tags", "meta"]))
    assert len(sil) == len(exp)
    for row in sil.itertuples():
        ex = exp[(row.repo, row.path)]["extra"] or {}
        assert norm_tags(row.tags) == ex.get("tags"), (row.repo, row.path)
        assert (row.meta or None) == ex.get("meta"), (row.repo, row.path)
    live_tags = [e["extra"].get("tags") for e in exp.values() if e["extra"]]
    assert any(t is None for t in live_tags) and any(t for t in live_tags), \
        "fixture must exercise both null and non-null nested values"

    # CDF carries the evolved nested columns: from table start, every live
    # key is one insert row with its current nested payload
    ch = _collect(r.table_changes(None, columns=["repo", "path", "tags", "meta"]))
    ins = ch[ch["_change_type"] == "insert"]
    assert len(ins) == len(exp)
    for row in ins.itertuples():
        ex = exp[(row.repo, row.path)]["extra"] or {}
        assert norm_tags(row.tags) == ex.get("tags"), (row.repo, row.path)
        assert (row.meta or None) == ex.get("meta"), (row.repo, row.path)

    # parquet round-trip of the evolved schema: exported file re-reads with
    # identical nested types and values
    out = str(tmp_path / "roundtrip.parquet")
    t = pa.concat_tables(r.read_silver(live_only=False).iter_batches(
        batch_format="pyarrow", batch_size=None))
    pq.write_table(t, out)
    back = pq.read_table(out)
    assert back.schema.field("tags").type == NESTED_TAGS_TYPE
    assert back.schema.field("meta").type == NESTED_META_TYPE
    assert back.num_rows == t.num_rows
    assert back.equals(t)  # values identical regardless of chunking

    # CLI read serves nested columns (arrow-first collect — a plain
    # Dataset.to_pandas() TensorArray-casts ragged lists and fails)
    import json as _json
    import subprocess
    import sys

    cp = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli", "read",
         "--root", str(tmp_path / "lake"), "--table", "silver",
         "--columns", "repo,path,tags,meta", "--limit", "5"],
        capture_output=True, text=True, check=True)
    rows_out = _json.loads(cp.stdout)["rows"]
    assert len(rows_out) == 5 and all("tags" in x and "meta" in x for x in rows_out)


def test_evolved_read_on_legacy_manifest(ray_session, tmp_path):
    """Manifests written before Fragment.cols existed: projecting evolved
    columns falls back to one footer read per fragment and still
    null-backfills pre-evolution fragments correctly."""
    import glob as _glob
    import re

    d = str(tmp_path / "nested")
    generate_events(d, n_events=1200, n_repos=5, n_epochs=2, seed=21,
                    nested_payload_from_epoch=1)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=2))
    r.setup()
    r.run(d)
    want = _collect(r.read_silver(columns=["repo", "path", "tags", "meta"]))
    # strip the recorded column lists → the legacy on-disk manifest shape
    mdir = os.path.join(r.silver.root, "_manifests")
    latest = max((p for p in _glob.glob(os.path.join(mdir, "manifest-*.json"))
                  if re.search(r"manifest-\d+\.json$", p)))
    m = json.load(open(latest))
    assert any(f.get("cols") for f in m["fragments"])
    for f in m["fragments"]:
        f.pop("cols", None)
    json.dump(m, open(latest, "w"))
    r2 = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=2))
    got = _collect(r2.read_silver(columns=["repo", "path", "tags", "meta"]))
    key = ["repo", "path"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        want.sort_values(key).reset_index(drop=True))


def test_gold_cadence_lag_and_finalize(ray_session, stream, tmp_path):
    src, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, gold_refresh_every_epochs=3)
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    out = r.run(src)
    # finalize_gold() must have brought gold to the silver watermark
    assert out["gold_epoch"] == out["silver_epoch"]
    _assert_matches_oracle(r, oracle)


def test_presalt_detects_hot_pid_before_first_merge(ray_session, tmp_path):
    """Pre-epoch sampling raises the hot pid's salt in epoch 0 — fragments are
    salt-sliced already at the FIRST commit (adaptive salting alone would only
    react from epoch 1), and the state still matches the oracle."""
    d = str(tmp_path / "skewed")
    files = generate_events(d, n_events=6000, n_repos=3, n_epochs=2, seed=11, zipf_s=3.0)
    oracle = replay_files(files)
    cfg = EngineConfig(num_partitions=2, hot_partition_rows=400, max_salt=8)
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(d, max_epochs=1)  # epoch 0 ONLY
    sm = r.silver.latest_manifest()
    assert sm.salt_map, "sampled pre-salting should engage before the first merge"
    pid = int(next(iter(sm.salt_map)))
    slices = {f.salt for f in sm.fragments if f.kind == "current" and f.pid == pid}
    assert len(slices) > 1, "epoch-0 fragments should already be salt-sliced"
    r.run(d)  # finish the replay; converges to oracle
    _assert_matches_oracle(r, oracle)


def test_hash_actor_exchange_matches_oracle(ray_session, stream, tmp_path):
    """The streaming hash-shuffle + actor-pool exchange (the large-epoch path
    bench.py exercises) converges to the same oracle state as sort/task."""
    d, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, merge_exchange="hash_actor")
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(d)
    _assert_matches_oracle(r, oracle)


def test_pipelined_bronze_prefetch_matches_oracle(ray_session, stream, tmp_path):
    """Background bronze prefetch of epoch k+1 during the merge of epoch k
    (pipeline_epochs) preserves exactly-once state and resumability."""
    d, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, pipeline_epochs=True,
                       hash_exchange_min_rows=1)  # force pipelining on tiny epochs
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    out = r.run(d)
    assert out["epochs_run"] == 4
    _assert_matches_oracle(r, oracle)
    assert r.run(d)["epochs_run"] == 0  # still exactly-once


def test_stream_progress_metrics(ray_session, stream, tmp_path):
    """Per-epoch progress records + reference-shaped stream metrics
    (get_stream_metrics, silver/cdf_processor.py:334-349)."""
    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    hist = r.epoch_history()
    assert [h["batch_id"] for h in hist] == [0, 1, 2, 3]
    for h in hist:
        assert h["num_input_rows"] > 0
        assert h["batch_duration_ms"] > 0
        assert h["input_rows_per_second"] > 0
    p = r.last_progress()
    assert p["batch_id"] == 3 and p["silver_epoch"] == 3
    m = r.stream_metrics()
    assert m["status"] == "idle" and m["batch_id"] == 3
    assert m["bronze_epoch"] == m["silver_epoch"] == m["gold_epoch"] == 3
    # CLI surface (no Ray session needed)
    import json as _json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli", "metrics",
         "--root", str(tmp_path / "lake")], capture_output=True, text=True, check=True)
    assert _json.loads(out.stdout)["batch_id"] == 3
    # --where must be honored on the changes branch (was silently dropped)
    sil = r.read_silver().to_pandas()
    some_repo = sorted(sil["repo"])[0]
    out = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli", "read",
         "--root", str(tmp_path / "lake"), "--table", "changes",
         "--from-epoch", "-1", "--where", f"repo={some_repo}",
         "--limit", "100000"], capture_output=True, text=True, check=True)
    rows = _json.loads(out.stdout)["rows"]
    assert rows and all(row["repo"] == some_repo for row in rows)


def test_materialized_views_staleness(ray_session, stream, tmp_path):
    """Per-view max_staleness (reference gold/materialized_views.py:41-52):
    views refresh only when their lag exceeds their own budget."""
    from maritime_activity_reports_cdc_ray.pipelines.views import ViewRegistry

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src, max_epochs=2)  # epochs 0-1
    reg = ViewRegistry(r)
    out = reg.refresh_due()
    assert set(out.values()) == {"refreshed"}  # all lag from -1
    st = reg.staleness()
    assert all(v["lag_epochs"] == 0 for v in st.values())
    # immediately after: everything is fresh
    assert set(reg.refresh_due().values()) == {"fresh"}
    # two more epochs: hot views (budget 1) refresh, the slow one (budget 3)
    # stays within budget
    r.run(src)  # epochs 2-3
    out = reg.refresh_due()
    assert out["repo_activity_summary"] == "refreshed"
    assert out["latest_repo_status"] == "refreshed"
    assert out["lang_breakdown"] == "fresh"
    assert reg.staleness()["lang_breakdown"]["lag_epochs"] == 2
    # view content matches gold
    g = r.read_gold().to_pandas()
    v = reg.read("repo_activity_summary")
    assert len(v) == len(g)
    assert int(v.total_versions.sum()) == int(g.total_versions.sum())
    # force refresh catches the slow view up
    assert reg.refresh_due(force=True)["lang_breakdown"] == "refreshed"
    lb = reg.read("lang_breakdown")
    assert int(lb.n_files.sum()) == int(g.file_count.sum())


def test_views_distributed_layout(ray_session, stream, tmp_path):
    """Scale-proofed built-ins (round-3 verdict #3): view fns return streamed
    Datasets — results land as versioned multi-file parquet with an atomic
    meta-pointer swap, superseded versions are pruned, the legacy single-file
    layout still reads, and lang_breakdown matches a per-row driver oracle."""
    import glob

    import pandas as pd
    import pyarrow.parquet as _pq

    from maritime_activity_reports_cdc_ray.pipelines.views import ViewRegistry

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src, max_epochs=2)
    reg = ViewRegistry(r)
    reg.refresh_due()
    # versioned layout: meta points at a v-dir holding >=1 parquet part
    d = os.path.join(r.root, "views", "repo_activity_summary")
    meta = json.load(open(os.path.join(d, "_meta.json")))
    assert meta["path"].startswith("v")
    parts = glob.glob(os.path.join(d, meta["path"], "*.parquet"))
    assert parts and not os.path.exists(os.path.join(d, "data.parquet"))
    # the distributed result equals gold exactly (values, not just counts)
    g = r.read_gold().to_pandas()
    v = reg.read("repo_activity_summary").sort_values("repo")
    pd.testing.assert_frame_equal(
        v.reset_index(drop=True),
        g[["repo", "file_count", "total_bytes", "total_versions",
           "deleted_count"]].sort_values("repo").reset_index(drop=True))
    # read_dataset streams the same rows
    assert reg.read_dataset("repo_activity_summary").count() == len(v)
    # lang_breakdown: distributed explode+hash_agg vs per-row driver oracle
    lb = reg.read("lang_breakdown")
    exp: dict[str, int] = {}
    for lc in g["lang_counts"]:
        for rec in lc:
            exp[rec["lang"]] = exp.get(rec["lang"], 0) + int(rec["n"])
    assert dict(zip(lb["lang"], lb["n_files"].astype(int))) == exp
    assert list(lb["lang"]) == sorted(exp)
    # a second refresh swaps the pointer and prunes the old version
    old = meta["path"]
    r.run(src)
    reg.refresh_due()
    meta2 = json.load(open(os.path.join(d, "_meta.json")))
    assert meta2["path"] != old
    assert not os.path.exists(os.path.join(d, old))
    # legacy single-file layout (pre-versioned) still reads
    ld = os.path.join(r.root, "views", "legacy_view")
    os.makedirs(ld, exist_ok=True)
    _pq.write_table(pa.table({"a": [1, 2]}), os.path.join(ld, "data.parquet"))
    json.dump({"epoch": 0, "rows": 2}, open(os.path.join(ld, "_meta.json"), "w"))
    assert list(reg.read("legacy_view")["a"]) == [1, 2]


def test_views_refresh_on_empty_lake(ray_session, tmp_path):
    """refresh_due on a freshly-setup (zero-row) lake must not crash: an
    empty Dataset pipeline can lose its schema entirely (res.schema() is
    None) and still needs a readable empty view file (review regression)."""
    from maritime_activity_reports_cdc_ray.pipelines.views import ViewRegistry

    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=2))
    r.setup()
    reg = ViewRegistry(r)
    out = reg.refresh_due()
    assert set(out.values()) == {"refreshed"}
    for name in out:
        assert len(reg.read(name)) == 0


def test_lang_breakdown_counts_null_lang(ray_session, tmp_path):
    """NULL lang is a REAL group in the gold lang histogram — the
    distributed explode+hash_agg must not drop it (review regression:
    pandas groupby dropna). Dirty events yield lang=None live rows."""
    import pandas as pd

    from maritime_activity_reports_cdc_ray.pipelines.views import ViewRegistry

    d = str(tmp_path / "dirty")
    generate_events(d, n_events=2000, n_repos=5, n_epochs=2, seed=13,
                    dirty_fraction=0.3)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=2))
    r.setup()
    r.run(d)
    g = r.read_gold().to_pandas()
    exp: dict = {}
    for lc in g["lang_counts"]:
        for rec in lc:
            exp[rec["lang"]] = exp.get(rec["lang"], 0) + int(rec["n"])
    assert None in exp, "fixture must produce live NULL-lang rows"
    reg = ViewRegistry(r)
    reg.refresh_due()
    lb = reg.read("lang_breakdown")
    got = {(None if pd.isna(k) else k): int(v)
           for k, v in zip(lb["lang"], lb["n_files"])}
    assert got == exp
    assert sum(got.values()) == int(g["file_count"].sum())


def test_bronze_bucket_exchange_matches_oracle(ray_session, stream, tmp_path):
    """The map-side-file exchange (bucketed bronze persist doubles as the
    shuffle) converges to the same oracle state as the other exchanges, and
    a crash after the bronze commit resumes through the unfused path."""
    d, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, merge_exchange="bronze_bucket")
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(d)
    _assert_matches_oracle(r, oracle)
    # bronze fragments are bucket-split ordinary fragments
    bm = r.bronze.latest_manifest()
    assert any("-b" in f.path for f in bm.fragments)
    # crash window: bronze of the next "epoch" committed, silver not → the
    # resume goes through the unfused exchange over the bucketed files
    lake2 = str(tmp_path / "lake2")
    r2 = CDCReplay(lake2, cfg)
    r2.setup()
    r2.run(d, max_epochs=2)
    # partially replay epoch 2: run the map phase only by replaying
    # run_epoch up to the bronze commit via the internal pieces
    r2._presalt_from_sample([files[2]])
    r2._maybe_resalt()
    import ray.data as rd  # noqa: F401  (session provided by fixture)

    # simulate: bronze committed via the bucketed writer, silver crashed
    r2._silver_merge(2, input_files=[files[2]])  # full path OK; then drop silver
    # (silver committed too here, so instead verify the unfused fallback on a
    # fresh lake: commit bronze unfused, then merge resumes with hash/sort)
    lake3 = str(tmp_path / "lake3")
    r3 = CDCReplay(lake3, EngineConfig(num_partitions=4, merge_exchange="bronze_bucket"))
    r3.setup()
    r3._bronze_ingest(0, [files[0]])  # unbucketed bronze, epoch 0
    r3._silver_merge(0)  # resume path: bronze_bucket demotes to sort/hash
    assert r3.silver.latest_manifest().epoch == 0
    r3.run(d)  # finish remaining epochs through the bucketed path
    _assert_matches_oracle(r3, oracle)


def test_premap_overlap_matches_oracle(ray_session, stream, tmp_path):
    """Premap mode: epoch k+1's map phase (bucketed bronze write) runs on a
    background thread during epoch k's merge, with the salt layout pinned.
    Same oracle state as the serial path; premap must actually engage."""
    d, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, merge_exchange="bronze_bucket",
                       hash_exchange_min_rows=1)  # tiny epochs premap too
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    out = r.run(d)
    assert out["epochs_run"] == 4
    assert r._premap_count >= 2  # epochs 1..3 are candidates
    _assert_matches_oracle(r, oracle)
    # rerun is still a no-op with premap enabled
    assert r.run(d)["epochs_run"] == 0


def test_premap_salt_pinning_with_hot_stream(ray_session, tmp_path):
    """A skewed stream that triggers presalt raises while premaps are in
    flight must converge to the oracle: the pinned layout and the deferred
    adaptation may disagree transiently, never corruptly."""
    d = str(tmp_path / "hot")
    files = generate_events(d, n_events=6000, n_repos=3, n_epochs=4, seed=7)
    oracle = replay_files(files)
    cfg = EngineConfig(num_partitions=4, merge_exchange="bronze_bucket",
                       hash_exchange_min_rows=1, hot_partition_rows=400,
                       default_salt=1, max_salt=8)
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(d)
    assert r._premap_count >= 1
    _assert_matches_oracle(r, oracle)
    # fragments ended aligned: layout per pid is a contiguous 0..s-1 salt run
    sm = r.silver.latest_manifest()
    by_pid = {}
    for f in sm.fragments:
        if f.kind == "current":
            by_pid.setdefault(f.pid, set()).add(f.salt)
    for pid, salts in by_pid.items():
        assert salts == set(range(len(salts))), (pid, salts)


def test_broadcast_exchange_matches_oracle(ray_session, stream, tmp_path):
    """The broadcast_task exchange (small epochs: materialized map blocks
    fetched whole by every merge task — no sort, no shuffle) converges to the
    same oracle state, premaps its map phase, stays exactly-once, and resumes
    through the unfused broadcast path when bronze committed but silver
    crashed."""
    d, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, merge_exchange="broadcast_task")
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    out = r.run(d)
    assert out["epochs_run"] == 4
    assert r._premap_count >= 2  # small epochs premap via _broadcast_map_phase
    _assert_matches_oracle(r, oracle)
    assert r.run(d)["epochs_run"] == 0  # exactly-once

    # crash window: bronze committed (unfused), silver not → the resume merge
    # reads committed bronze through the broadcast exchange (fused=False)
    lake2 = str(tmp_path / "lake2")
    r2 = CDCReplay(lake2, cfg)
    r2.setup()
    r2._bronze_ingest(0, [files[0]])
    assert r2.silver.latest_manifest().epoch == -1
    r2._silver_merge(0)
    assert r2.silver.latest_manifest().epoch == 0
    r2.run(d)  # finish remaining epochs
    _assert_matches_oracle(r2, oracle)


def test_broadcast_gate_respects_byte_cap(ray_session, stream, tmp_path):
    """Epochs above broadcast_exchange_max_bytes must NOT take the broadcast
    path under auto (cluster-scale guard: broadcast replicates the epoch to
    every node holding a merge task)."""
    d, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, broadcast_exchange_max_bytes=0)
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    assert r._choose_exchange(1000, fused=True, est_bytes=1) == "sort_task"
    cfg2 = EngineConfig(num_partitions=4)
    r2 = CDCReplay(str(tmp_path / "lake2"), cfg2)
    assert r2._choose_exchange(1000, fused=True, est_bytes=1) == "broadcast_task"
    assert r2._choose_exchange(1000, fused=True, est_bytes=None) == "sort_task"
    assert r2._choose_exchange(2_000_000, fused=True, est_bytes=1) == "bronze_bucket"
    # byte-capped stream still converges (sort_task path)
    out = r.run(d)
    assert out["epochs_run"] == 4
    _assert_matches_oracle(r, oracle)


def test_silver_stores_pointer_not_content(ray_session, stream, tmp_path):
    """Scale invariant: silver fragments persist a bronze pointer, never the
    payload (content is ~83% of stream bytes) — yet ``read_silver`` serves a
    correct virtual ``content`` column, exact per-row sha roundtrip."""
    import hashlib

    import pyarrow.parquet as pq

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    sm = r.silver.latest_manifest()
    paths = r.silver.all_fragment_paths(sm, kind="current")
    assert paths
    for p in paths:
        names = pq.read_schema(p).names
        assert "content" not in names and "content_epoch" in names, p
    sil = r.read_silver(columns=["repo", "path", "content", "content_sha256"]).to_pandas()
    assert list(sil.columns) == ["repo", "path", "content", "content_sha256"]
    assert sil.content.notna().all()
    for c, s in zip(sil.content, sil.content_sha256):
        assert hashlib.sha256(c.encode("utf-8", "surrogatepass")).hexdigest() == s
    # tombstones come back null, not the bronze sentinel
    full = r.read_silver(live_only=False).to_pandas()
    dead = full[full.is_deleted]
    if len(dead):
        assert dead.content.isna().all()


def test_compact_vacuum_keep_content_pointers(ray_session, stream, tmp_path):
    """Maintenance must not break the virtual-content contract: history
    compaction + vacuum on every table (bronze included — its committed
    epochs stay manifest-referenced) leaves oracle state and the content
    join intact."""
    import hashlib

    from maritime_activity_reports_cdc_ray.pipelines.maintenance import compact_table

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    h_before = r.read_history().count()
    stats = compact_table(r.silver, kinds=("history",))
    assert stats["compacted_groups"] > 0 and stats["fragments_removed"] > 0
    removed = sum(t.vacuum() for t in (r.bronze, r.silver, r.gold))
    assert removed >= 0
    assert r.read_history().count() == h_before
    _assert_matches_oracle(r, oracle)
    sil = r.read_silver(columns=["content", "content_sha256"]).to_pandas()
    assert sil.content.notna().all()
    for c, s in zip(sil.content, sil.content_sha256):
        assert hashlib.sha256(c.encode("utf-8", "surrogatepass")).hexdigest() == s


def test_rematerialize_content_bounds_bronze(ray_session, stream, tmp_path):
    """Bronze retention under the content-pointer design: old bronze epochs
    are droppable after still-referenced payloads consolidate into a
    maintenance epoch — oracle state and the content join survive, files are
    physically reclaimed, and a second cycle consolidates the first."""
    import hashlib

    from maritime_activity_reports_cdc_ray.pipelines.maintenance import (
        REMAT_BASE,
        rematerialize_content,
    )

    def assert_content_ok(r):
        sil = r.read_silver(columns=["content", "content_sha256"]).to_pandas()
        assert sil.content.notna().all()
        for c, s in zip(sil.content, sil.content_sha256):
            assert hashlib.sha256(c.encode("utf-8", "surrogatepass")).hexdigest() == s

    src, files, oracle = stream
    # private copy: this test appends an extra epoch file later, which must
    # not leak into the session-scoped fixture other tests replay
    import shutil

    priv = str(tmp_path / "stream")
    shutil.copytree(src, priv)
    src = priv
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    stats = rematerialize_content(r, retain_epochs=1)
    assert stats["pruned_epochs"] == 3 and stats["rematerialized_rows"] > 0
    assert stats["remat_epoch"] == REMAT_BASE
    bm = r.bronze.latest_manifest()
    assert {f.epoch for f in bm.fragments if f.kind == "data"} == {3, REMAT_BASE}
    removed = r.bronze.vacuum() + r.silver.vacuum()
    assert removed > 0
    _assert_matches_oracle(r, oracle)
    assert_content_ok(r)
    # second cycle: steady state — only the single newest maintenance epoch
    # remains below the cutoff, so the run is a NO-OP (re-consolidating it
    # would churn O(all referenced content) for zero pruning benefit)
    stats2 = rematerialize_content(r, retain_epochs=1)
    assert stats2["pruned_epochs"] == 0 and stats2["rematerialized_rows"] == 0
    bm2 = r.bronze.latest_manifest()
    assert {f.epoch for f in bm2.fragments if f.kind == "data"} == {3, REMAT_BASE}
    _assert_matches_oracle(r, oracle)
    assert_content_ok(r)
    # a NEW raw epoch arriving re-arms the consolidation: run one more epoch
    # past the retention window and the third cycle prunes again
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    extra = _pa.Table.from_pylist([{
        "repo": "r-extra", "path": "x.py", "commit": "c999999999999",
        "lang": "py", "content": "zz"}])
    extra = extra.set_column(4, "content",
                             extra.column("content").cast(_pa.large_string()))
    _pq.write_table(extra, os.path.join(src, "part-00004.parquet"))
    r.run(src)
    stats3 = rematerialize_content(r, retain_epochs=1)
    assert stats3["pruned_epochs"] >= 1 and stats3["remat_epoch"] == REMAT_BASE + 1
    r.bronze.vacuum(), r.silver.vacuum()
    bm3 = r.bronze.latest_manifest()
    assert {f.epoch for f in bm3.fragments if f.kind == "data"} == {4, REMAT_BASE + 1}
    assert_content_ok(r)  # every live row's payload still joins, sha-exact
    sil = r.read_silver(columns=["repo", "content"]).to_pandas()
    assert (sil.repo == "r-extra").sum() == 1
    assert sil.loc[sil.repo == "r-extra", "content"].iloc[0] == "zz"


def test_remat_crash_between_commits_stays_consistent(ray_session, stream, tmp_path):
    """Crash-safety of rematerialize_content's commit ordering: dying right
    after the maintenance epoch commits (before silver pointers retarget)
    leaves a fully consistent lake — old epochs still referenced, content
    join exact — and a rerun converges."""
    import hashlib

    from maritime_activity_reports_cdc_ray.pipelines.maintenance import (
        REMAT_BASE,
        rematerialize_content,
    )

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)

    # simulate the crash: let step 1 (bronze maintenance-epoch commit) land,
    # then die before the silver pointer rewrite commits
    real_commit = type(r.silver).commit_maintenance
    boom = RuntimeError("simulated crash before silver pointer commit")

    def dying(self, *a, **k):
        if self is r.silver:
            raise boom
        return real_commit(self, *a, **k)

    import pytest as _pytest

    type(r.silver).commit_maintenance = dying
    try:
        with _pytest.raises(RuntimeError):
            rematerialize_content(r, retain_epochs=1)
    finally:
        type(r.silver).commit_maintenance = real_commit

    # lake must still be fully consistent: old epochs referenced, join exact
    bm = r.bronze.latest_manifest()
    eps = {f.epoch for f in bm.fragments if f.kind == "data"}
    assert {0, 1, 2, 3} <= eps and REMAT_BASE in eps  # step 1 landed, nothing pruned
    _assert_matches_oracle(r, oracle)
    sil = r.read_silver(columns=["content", "content_sha256"]).to_pandas()
    assert sil.content.notna().all()

    # rerun converges (consolidates into a NEW maintenance epoch)
    stats = rematerialize_content(r, retain_epochs=1)
    assert stats["rematerialized_rows"] > 0
    r.bronze.vacuum(), r.silver.vacuum()
    bm2 = r.bronze.latest_manifest()
    assert {f.epoch for f in bm2.fragments if f.kind == "data"} == {3, stats["remat_epoch"]}
    _assert_matches_oracle(r, oracle)
    sil = r.read_silver(columns=["content", "content_sha256"]).to_pandas()
    for c, s in zip(sil.content, sil.content_sha256):
        assert hashlib.sha256(c.encode("utf-8", "surrogatepass")).hexdigest() == s


def test_curation_pipeline_composes_end_to_end(ray_session, stream, tmp_path):
    """The full curation story on top of the lake: replay → live silver →
    exact content dedup (one keeper per sha) → deterministic stratified
    sample → resumable partitioned output — every stage streaming, the
    output readable back as hive-partitioned parquet."""
    from maritime_activity_reports_cdc_ray.functions.dedup import exact_dedup
    from maritime_activity_reports_cdc_ray.functions.sample import md5_hash_sample
    from maritime_activity_reports_cdc_ray.sources.writers import write_partitioned

    import ray.data as rd

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    live = r.read_silver(columns=["repo", "path", "commit", "lang",
                                  "content_sha256", "content_bytes"])
    n_live = live.count()
    deduped = exact_dedup(live, cols=["content_sha256"],
                          order=["repo", "path"], id_col="commit")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_live
    sampled = md5_hash_sample(deduped, "content_sha256",
                              keep_hex=tuple("01234567"))  # ~50%
    out_root = str(tmp_path / "curated")
    res = write_partitioned(sampled, out_root, by="lang")
    assert res["rows"] > 0 and res["partitions_written"] >= 1
    back = rd.read_parquet(out_root)
    assert back.count() == res["rows"]
    # deterministic end to end: rerunning the sample yields the same rows
    again = md5_hash_sample(deduped, "content_sha256",
                            keep_hex=tuple("01234567")).count()
    assert again == res["rows"]


def test_quarantine_dead_letter_sink(ray_session, tmp_path):
    """cfg.quarantine_rejects routes validator-dropped rows to a dead-letter
    table with reject reasons instead of silently vanishing; reruns rewrite
    (never duplicate) it; valid-row state is identical to a run without the
    sink."""
    import pyarrow.parquet as _pq

    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=1500, n_repos=8, n_epochs=2, seed=9)
    # plant three hard-invalid rows (one per reason) into epoch 0's file
    t = _pq.read_table(files[0])
    bad = pa.table({
        "repo": pa.array([None, "r-bad", "r-bad"], pa.string()),
        "path": pa.array(["p1", "p2", "p3"], pa.string()),
        "commit": pa.array(["c000000000001", "nope", "c000000000002"],
                           pa.string()),
        "lang": pa.array(["py", "py", "py"], pa.string()),
        "content": pa.array(["x", "y", None], pa.large_string()),
    }).cast(t.schema)
    _pq.write_table(pa.concat_tables([t, bad]), files[0])

    lake_q = CDCReplay(str(tmp_path / "lake_q"),
                       EngineConfig(num_partitions=4, quarantine_rejects=True))
    lake_q.setup()
    out = lake_q.run(d)
    assert out["epochs_run"] == 2

    q = lake_q.read_quarantine().to_pandas()
    assert len(q) == 3
    assert sorted(q["reject_reason"]) == ["bad_commit", "null_content", "null_key"]
    assert (q["quality_category"] == "INVALID").all()
    # the planted rows are identifiable
    assert set(q["path"]) == {"p1", "p2", "p3"}

    # rerun is a no-op for tables AND does not duplicate the dead letters
    out2 = lake_q.run(d)
    assert out2["epochs_run"] == 0
    assert lake_q.read_quarantine().count() == 3

    # valid-row state identical to a run with the sink off
    lake_p = CDCReplay(str(tmp_path / "lake_p"), EngineConfig(num_partitions=4))
    lake_p.setup()
    lake_p.run(d)
    key = lambda df: df.sort_values(["repo", "path"]).reset_index(drop=True)
    a = key(lake_q.read_silver().to_pandas())[["repo", "path", "commit", "content_sha256"]]
    b = key(lake_p.read_silver().to_pandas())[["repo", "path", "commit", "content_sha256"]]
    assert a.equals(b)
    assert lake_p.read_quarantine().count() == 0  # knob off -> empty surface


def test_quarantine_repair_and_replay(ray_session, tmp_path):
    """The full dead-letter loop: rejected rows are read back from
    quarantine, repaired, appended to the stream as a new file, and the next
    incremental run folds them in — final state equals a stream that was
    never corrupted."""
    import pyarrow.parquet as _pq

    clean_dir, broken_dir = str(tmp_path / "clean"), str(tmp_path / "broken")
    files = generate_events(clean_dir, n_events=1200, n_repos=6, n_epochs=2, seed=4)
    os.makedirs(broken_dir)
    # broken stream: same events, but one file has a corrupted commit on its
    # last row (the repair target)
    import shutil as _sh

    for f in files:
        _sh.copy(f, broken_dir)
    bfiles = sorted(os.path.join(broken_dir, os.path.basename(f)) for f in files)
    t = _pq.read_table(bfiles[0])
    corrupt = t.set_column(t.schema.get_field_index("commit"), "commit",
                           pa.array([c.as_py() if i < t.num_rows - 1 else "BROKEN"
                                     for i, c in enumerate(t.column("commit"))],
                                    pa.string()))
    _pq.write_table(corrupt, bfiles[0])
    fixed_commit = t.column("commit")[t.num_rows - 1].as_py()

    lake = CDCReplay(str(tmp_path / "lake"),
                     EngineConfig(num_partitions=4, quarantine_rejects=True))
    lake.setup()
    lake.run(broken_dir)
    q = lake.read_quarantine().to_pandas()
    assert len(q) == 1 and q["reject_reason"].iloc[0] == "bad_commit"

    # repair: restore the true commit, append as a new stream file; the next
    # run discovers it as one more epoch
    repaired = pa.table({
        "repo": pa.array(q["repo"], pa.string()),
        "path": pa.array(q["path"], pa.string()),
        "commit": pa.array([fixed_commit], pa.string()),
        "lang": pa.array(q["lang"], pa.string()),
        "content": pa.array(q["content"], pa.large_string()),
    })
    _pq.write_table(repaired, os.path.join(broken_dir, "part-99-repair.parquet"))
    out = lake.run(broken_dir)
    assert out["epochs_run"] == 1  # only the repair epoch

    # reference: the never-corrupted stream replayed fresh
    ref = CDCReplay(str(tmp_path / "lake_ref"), EngineConfig(num_partitions=4))
    ref.setup()
    ref.run(clean_dir)
    key = lambda df: df.sort_values(["repo", "path"]).reset_index(drop=True)
    a = key(lake.read_silver().to_pandas())[["repo", "path", "commit", "content_sha256"]]
    b = key(ref.read_silver().to_pandas())[["repo", "path", "commit", "content_sha256"]]
    assert a.equals(b)


def test_table_changes_matches_prefix_oracles(ray_session, stream, tmp_path):
    """CDF read (net change feed): table_changes(1, 3) must equal the diff
    of the dict-oracle states after epoch 1 and epoch 3 — inserts for keys
    newly live, deletes for keys that went dead (tombstones), one
    pre/post-image pair per key whose winning commit changed, nothing for
    untouched keys. Also: the full-range feed equals the live state as
    inserts, and an empty range is empty."""
    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)

    l1 = replay_files(files[:2]).expected_silver()  # live keys as of epoch 1
    l3 = oracle.expected_silver()                   # live keys as of epoch 3
    exp = {}
    for k in l3.keys() - l1.keys():
        exp[(*k, "insert")] = l3[k]["commit"]
    for k in l1.keys() - l3.keys():
        exp[(*k, "delete")] = l1[k]["commit"]
    for k in l3.keys() & l1.keys():
        if l1[k]["commit"] != l3[k]["commit"]:
            exp[(*k, "update_preimage")] = l1[k]["commit"]
            exp[(*k, "update_postimage")] = l3[k]["commit"]

    ch = r.table_changes(1, 3).to_pandas()
    got = dict(zip(zip(ch["repo"], ch["path"], ch["_change_type"]),
                   ch["commit"]))
    assert got == exp
    assert len(ch) == len(exp)  # no duplicate rows

    full = r.table_changes(None).to_pandas()
    assert set(full["_change_type"]) <= {"insert"}
    assert dict(zip(zip(full["repo"], full["path"]), full["commit"])) == \
        {k: v["commit"] for k, v in l3.items()}
    assert r.table_changes(3, 3).to_pandas().empty
    # inverted range must fail loudly, not return a swapped feed
    import pytest as _pytest
    with _pytest.raises(ValueError):
        r.table_changes(3, 1)


def test_export_snapshot_partitioned(ray_session, stream, tmp_path):
    """CLI-level export analogue (reference: GCS/BigQuery export): a
    consistent as-of snapshot lands as hive-partitioned parquet through the
    resumable sink; content equals the reader; rerun skips everything."""
    import glob as _glob
    import subprocess
    import sys

    import pandas as pd
    import pyarrow.parquet as _pq

    src, files, oracle = stream
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(src)
    dest = str(tmp_path / "exp")
    out = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli",
         "--num-cpus", "4", "export", "--root", str(tmp_path / "lake"),
         "--table", "silver", "--dest", dest, "--partition-by", "lang",
         "--columns", "repo,path,commit,lang,content_sha256"],
        capture_output=True, text=True, check=True)
    import json as _json
    res = _json.loads(out.stdout.strip().splitlines()[-1])
    assert res["partitions_skipped"] == 0 and res["rows"] > 0
    got = pd.concat(
        [_pq.read_table(f).to_pandas()
         for f in _glob.glob(os.path.join(dest, "*", "*.parquet"))],
        ignore_index=True).sort_values(["repo", "path"]).reset_index(drop=True)
    exp = (r.read_silver(columns=["repo", "path", "commit", "lang",
                                  "content_sha256"]).to_pandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    assert got[["repo", "path", "commit", "content_sha256"]].equals(
        exp[["repo", "path", "commit", "content_sha256"]])
    assert res["rows"] == len(exp)
    # rerun: everything already exported -> all partitions skipped
    out2 = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli",
         "--num-cpus", "4", "export", "--root", str(tmp_path / "lake"),
         "--table", "silver", "--dest", dest, "--partition-by", "lang",
         "--columns", "repo,path,commit,lang,content_sha256"],
        capture_output=True, text=True, check=True)
    res2 = _json.loads(out2.stdout.strip().splitlines()[-1])
    assert res2["partitions_written"] == 0
    assert res2["partitions_skipped"] == res["partitions_written"]


def test_auto_compact_at_run_end(ray_session, stream, tmp_path):
    """auto_compact_min_chain: a run whose silver chains exceed the
    threshold compacts them at run end — same oracle state, single-fragment
    chains, rerun still a no-op."""
    src, files, oracle = stream
    cfg = EngineConfig(num_partitions=4, auto_compact_min_chain=2)
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    out = r.run(src)  # 4 epochs -> history chains of up to 4 fragments
    assert out.get("auto_compacted", {}).get("compacted_groups", 0) > 0
    m = r.silver.latest_manifest()
    chains = {}
    for f in m.fragments:
        if f.kind in ("history", "current"):
            k = (f.pid, f.salt, f.kind)
            chains[k] = chains.get(k, 0) + 1
    assert max(chains.values()) == 1
    _assert_matches_oracle(r, oracle)
    assert r.run(src)["epochs_run"] == 0  # watermark untouched
    _assert_matches_oracle(r, oracle)


def test_delete_where_tombstone_feed(ray_session, stream, tmp_path):
    """DELETE FROM as a deletion feed: make_tombstones writes tombstone
    events for the matching live keys; appended as the next epoch and
    replayed, the keys vanish from silver, gold drops them, the CDF reports
    deletes, and the whole lake equals the dict oracle of the extended
    stream (exactly-once rerun included)."""
    import shutil

    src, files, oracle = stream
    d2 = str(tmp_path / "stream2")
    os.makedirs(d2)
    for f in files:
        shutil.copy(f, d2)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d2)
    sil = r.read_silver(columns=["repo", "path"]).to_pandas()
    victim = sorted(set(sil["repo"]))[0]
    n_victim = int((sil["repo"] == victim).sum())
    out = r.make_tombstones(("repo", "==", victim),
                            os.path.join(d2, "part-00004.parquet"))
    assert out["tombstones"] == n_victim > 0
    ran = r.run(d2)
    assert ran["epochs_run"] == 1
    sil2 = r.read_silver(columns=["repo", "path"]).to_pandas()
    assert victim not in set(sil2["repo"])
    g = r.read_gold().to_pandas()
    grow = g[g["repo"] == victim]
    assert len(grow) == 0 or int(grow["file_count"].iloc[0]) == 0
    ch = r.table_changes(3, 4).to_pandas()
    assert set(ch[ch["repo"] == victim]["_change_type"]) == {"delete"}
    assert len(ch[ch["repo"] == victim]) == n_victim
    # the extended stream replays to the same state in the dict oracle
    d2_files = sorted(__import__("glob").glob(os.path.join(d2, "*.parquet")))
    _assert_matches_oracle(r, replay_files(d2_files))
    assert r.run(d2)["epochs_run"] == 0  # exactly-once


def test_update_where_feed(ray_session, stream, tmp_path):
    """UPDATE ... SET as an update feed: matching keys get the new column
    value with content carried forward, a fresh SCD2 version is minted, the
    CDF shows pre/post pairs, and the lake equals the dict oracle of the
    extended stream."""
    import shutil

    src, files, oracle = stream
    d2 = str(tmp_path / "stream2")
    os.makedirs(d2)
    for f in files:
        shutil.copy(f, d2)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d2)
    sil = r.read_silver(columns=["repo", "path", "content_sha256"]).to_pandas()
    victim = sorted(set(sil["repo"]))[0]
    before = sil[sil["repo"] == victim].set_index("path")["content_sha256"]
    out = r.make_updates(("repo", "==", victim), {"lang": "zz"},
                         os.path.join(d2, "part-00004.feed"))
    assert out["updates"] == len(before) > 0
    assert out["files"] >= 1
    assert os.path.exists(os.path.join(d2, "part-00004.feed", "_SUCCESS"))
    ran = r.run(d2)
    assert ran["epochs_run"] == 1  # the whole multi-file feed is ONE epoch
    sil2 = r.read_silver(
        columns=["repo", "path", "lang", "content_sha256"]).to_pandas()
    vic = sil2[sil2["repo"] == victim]
    assert set(vic["lang"]) == {"zz"}
    # content untouched: same sha per key
    after = vic.set_index("path")["content_sha256"]
    assert after.sort_index().equals(before.sort_index())
    ch = r.table_changes(3, 4).to_pandas()
    vch = ch[ch["repo"] == victim]
    assert set(vch["_change_type"]) == {"update_preimage", "update_postimage"}
    _glob = __import__("glob")
    d2_files = sorted(_glob.glob(os.path.join(d2, "*.parquet"))) + sorted(
        _glob.glob(os.path.join(d2, "part-00004.feed", "*.parquet")))
    _assert_matches_oracle(r, replay_files(d2_files))


def test_update_feed_preserves_evolved_payload(ray_session, tmp_path):
    """make_updates on a lake with evolved (nested) payload columns must
    CARRY them on the feed event — the bumped commit wins LWW, so a feed
    that omitted tags/meta would null them (review regression). Also pins:
    SET of an evolved column, and rejection of unknown SET columns."""
    import shutil

    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=1500, n_repos=5, n_epochs=2, seed=9,
                            nested_payload_from_epoch=0, p_delete=0.0)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=2))
    r.setup()
    r.run(d)
    before = _collect(r.read_silver(columns=["repo", "path", "tags", "meta"]))
    victim = sorted(set(before["repo"]))[0]
    vic_before = before[before["repo"] == victim].set_index("path")

    out = r.make_updates(("repo", "==", victim), {"lang": "zz"},
                         os.path.join(d, "part-00002.feed"))
    assert out["updates"] == len(vic_before) > 0
    r.run(d)
    after = _collect(r.read_silver(
        columns=["repo", "path", "lang", "tags", "meta"]))
    vic = after[after["repo"] == victim].set_index("path")
    assert set(vic["lang"]) == {"zz"}

    def norm(v):
        import numpy as np
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return list(v) if not isinstance(v, dict) else v
    for p in vic.index:
        assert norm(vic.loc[p, "tags"]) == norm(vic_before.loc[p, "tags"]), p
        assert (vic.loc[p, "meta"] or None) == \
            (vic_before.loc[p, "meta"] or None), p

    # SET of an evolved column applies as a constant
    out2 = r.make_updates(("repo", "==", victim), {"tags": ["curated"]},
                          os.path.join(d, "part-00003.feed"))
    assert out2["updates"] == len(vic_before)
    r.run(d)
    after2 = _collect(r.read_silver(columns=["repo", "path", "tags"]))
    vic2 = after2[after2["repo"] == victim]
    assert all(list(t) == ["curated"] for t in vic2["tags"])
    # unknown SET column is refused loudly
    with pytest.raises(ValueError, match="neither base event columns"):
        r.make_updates(("repo", "==", victim), {"nope": 1},
                       os.path.join(d, "part-00004.feed"))
    shutil.rmtree(os.path.join(d, "part-00004.feed"), ignore_errors=True)


def test_bump_commits_overflow_stays_lww_greater():
    """'c999' must bump to a LEXICOGRAPHICALLY greater commit — the naive
    carry 'c1000' sorts BELOW 'c999' and the delete would silently never
    apply (review regression)."""
    from maritime_activity_reports_cdc_ray.pipelines.replay import _bump_commits

    src = ["c0042", "c999", "c000000000009", "c9"]
    out = _bump_commits(pa.array(src)).to_pylist()
    assert out[0] == "c0043" and out[2] == "c000000000010"
    for s, b in zip(src, out):
        assert b > s, (s, b)  # the LWW invariant, string order


def test_dml_feed_streams_no_driver_collect(ray_session, stream, tmp_path,
                                            monkeypatch):
    """The DML feeds are produced by a streaming map_batches kernel over the
    pruned silver read — never a full-predicate driver collect. Guarded by
    poisoning Dataset.to_pandas for the duration of the feed build; also
    checks feed-dir idempotence (an existing _SUCCESS short-circuits) and
    the crashed-feed guard in discover_epochs."""
    import shutil

    import pytest
    import ray.data

    src, files, oracle = stream
    d2 = str(tmp_path / "stream2")
    os.makedirs(d2)
    for f in files:
        shutil.copy(f, d2)
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(d2)
    sil = r.read_silver(columns=["repo"]).to_pandas()
    victim = sorted(set(sil["repo"]))[0]
    feed = os.path.join(d2, "part-00004.feed")

    def _boom(self, *a, **k):
        raise AssertionError("DML feed path collected the Dataset on the driver")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", _boom)
    out = r.make_tombstones(("repo", "==", victim), feed)
    monkeypatch.undo()
    assert out["tombstones"] == int((sil["repo"] == victim).sum()) > 0
    # idempotent re-invocation: _SUCCESS short-circuits, same counts
    again = r.make_tombstones(("repo", "==", victim), feed)
    assert again.get("skipped") is True
    assert again["tombstones"] == out["tombstones"]
    assert again["files"] == out["files"]
    # a crashed generation (no _SUCCESS) must fail fast, not half-apply
    os.remove(os.path.join(feed, "_SUCCESS"))
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        CDCReplay.discover_epochs(d2)
    open(os.path.join(feed, "_SUCCESS"), "w").close()
    ran = r.run(d2)
    assert ran["epochs_run"] == 1
    assert victim not in set(r.read_silver(columns=["repo"]).to_pandas()["repo"])
    # empty-match feed: still a valid (empty) epoch, applied exactly-once
    feed2 = os.path.join(d2, "part-00005.feed")
    out2 = r.make_tombstones(("repo", "==", "no-such-repo"), feed2)
    assert out2["tombstones"] == 0 and out2["files"] >= 1
    assert r.run(d2)["epochs_run"] == 1
    assert r.run(d2)["epochs_run"] == 0
