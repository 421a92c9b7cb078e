"""Round-3 features: epoch-pinned time travel, distributed global rank,
semi-join gating, SQL-reproducible hash primitives, format-version guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# time travel
# ---------------------------------------------------------------------------
def _mini_stream(tmp_path, n_epochs=3):
    """3 epochs over 2 keys: k1 updated every epoch, k2 only in epoch 0."""
    d = tmp_path / "events"
    d.mkdir()
    for e in range(n_epochs):
        rows = [{"repo": "r1", "path": "a.py", "commit": f"c{e:03d}",
                 "lang": "py", "content": f"v{e}"}]
        if e == 0:
            rows.append({"repo": "r2", "path": "b.py", "commit": "c000",
                         "lang": "py", "content": "w0"})
        t = pa.Table.from_pylist(rows)
        t = t.set_column(4, "content", t.column("content").cast(pa.large_string()))
        pq.write_table(t, str(d / f"part-{e:05d}.parquet"))
    return str(d)


def test_read_silver_as_of_epoch(ray_session, tmp_path):
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

    events = _mini_stream(tmp_path)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=2, commit_regex=r"^c[0-9]{3}$"))
    r.setup()
    r.run(events)
    # dict-replay oracle per epoch: k1 -> v{e}, k2 -> w0
    for e in range(3):
        df = r.read_silver(columns=["repo", "path", "content"],
                           as_of_epoch=e).to_pandas()
        got = dict(zip(df.repo + "/" + df.path, df.content))
        assert got == {"r1/a.py": f"v{e}", "r2/b.py": "w0"}, (e, got)
    # latest == as_of latest epoch
    latest = r.read_silver(columns=["repo", "path", "content"]).to_pandas()
    pinned = r.read_silver(columns=["repo", "path", "content"],
                           as_of_epoch=2).to_pandas()
    assert sorted(latest.content) == sorted(pinned.content)
    # history is pinned too: epoch 0 has no closed versions yet
    h0 = r.read_history(as_of_epoch=0).to_pandas()
    h2 = r.read_history(as_of_epoch=2).to_pandas()
    assert len(h0) == 0 and len(h2) == 2
    with pytest.raises(LookupError):
        r.silver.manifest_as_of(-2)


def test_format_version_guard(ray_session, tmp_path):
    """A v1 (pre-content-pointer) manifest must fail fast with a clear error."""
    import json
    import os

    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

    events = _mini_stream(tmp_path)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=2, commit_regex=r"^c[0-9]{3}$"))
    r.setup()
    r.run(events)
    mdir = os.path.join(r.silver.root, "_manifests")
    latest = sorted(os.listdir(mdir))[-1]
    mp = os.path.join(mdir, latest)
    d = json.load(open(mp))
    d.pop("format_version")  # simulate a lake written before the field existed
    json.dump(d, open(mp, "w"))
    with pytest.raises(RuntimeError, match="format v1"):
        r.read_silver()


# ---------------------------------------------------------------------------
# distributed global rank
# ---------------------------------------------------------------------------
def test_global_rank_distributed_ties_across_blocks(ray_session):
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.window import global_rank

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 40, size=5000)  # heavy ties, will span sort blocks
    df = pd.DataFrame({"id": np.arange(5000), "v": vals})
    ds = rd.from_pandas(df).repartition(16)
    out = global_rank(ds, "v", descending=True).to_pandas()
    expect = df["v"].rank(method="min", ascending=False).astype("int64")
    merged = out.set_index("id")["rnk"].sort_index().to_numpy()
    assert (merged == expect.to_numpy()).all()
    # ascending too
    out2 = global_rank(ds, "v", descending=False).to_pandas()
    expect2 = df["v"].rank(method="min", ascending=True).astype("int64")
    assert (out2.set_index("id")["rnk"].sort_index().to_numpy()
            == expect2.to_numpy()).all()


# ---------------------------------------------------------------------------
# semi_join gating
# ---------------------------------------------------------------------------
def test_semi_join_broadcast_and_shuffle_paths(ray_session):
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.join import semi_join

    big = rd.from_pandas(pd.DataFrame({"k": np.arange(1000) % 50,
                                       "x": np.arange(1000)}))
    keys = rd.from_pandas(pd.DataFrame({"kk": [3, 7, 11, 3]}))  # dup key too
    out = semi_join(big, keys, on="k", keys_on="kk").to_pandas()
    assert sorted(out.k.unique()) == [3, 7, 11]
    assert len(out) == 60
    # shuffle path (force by tiny gate): same result, no driver collect
    out2 = semi_join(big, keys, on="k", keys_on="kk",
                     broadcast_limit_rows=0).to_pandas()
    assert len(out2) == 60 and sorted(out2.k.unique()) == [3, 7, 11]


# ---------------------------------------------------------------------------
# SQL-reproducible hash primitives
# ---------------------------------------------------------------------------
def test_md5_u64_matches_duckdb():
    import duckdb

    from maritime_activity_reports_cdc_ray.hashing import md5_u64

    con = duckdb.connect()
    for s in ["", "hello", "café", "a b\tc", "ünïcode"]:
        sql = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT", [s]).fetchone()[0]
        assert int(sql) == md5_u64(s), s


def test_rolling_fingerprint_properties():
    from maritime_activity_reports_cdc_ray.functions.text import RollingFingerprint

    rf = RollingFingerprint(k=8, w=16)
    base = "the quick brown fox jumps over the lazy dog " * 20
    assert rf._fingerprint(base) == rf._fingerprint(base)  # deterministic
    # identical docs share all fingerprints; a local edit changes few
    a = set(rf._windows(base).tolist())
    b = set(rf._windows(base.replace("lazy", "hazy", 1)).tolist())
    inter = len(a & b) / len(a | b)
    assert inter > 0.5, inter
    # winnowing guarantee: every window of w k-grams contributes a minimum
    assert rf._windows("").tolist() == [0]
    assert len(rf._windows("short")) == 1  # len < k -> one whole-string gram


def test_hll_close_to_exact(ray_session):
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.stats import hll_count_distinct

    n = 5000
    df = pd.DataFrame({"u": np.arange(n) % 1234})
    est = hll_count_distinct(rd.from_pandas(df).repartition(4), ["u"], p=12)
    assert abs(est - 1234) / 1234 < 0.05


def test_minhash_small_and_partitioned_paths_agree(ray_session):
    """The size-gated single-task pairing path and the hash-partitioned
    exchange path must produce the identical candidate set."""
    import ray.data as rd

    from maritime_activity_reports_cdc_ray.functions.dedup import (
        minhash_lsh_candidates,
    )

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])

    def pairs(ds):
        df = ds.to_pandas()
        return sorted(map(tuple, df[["id_a", "id_b"]].to_numpy()))

    small = pairs(minhash_lsh_candidates(docs, num_perm=64, bands=16))
    big = pairs(minhash_lsh_candidates(docs, num_perm=64, bands=16,
                                       small_gate_rows=0))
    assert small == big and len(small) > 0


def test_simhash_bands_exact_recall():
    """bands > max_hamming ⇒ every qualifying pair shares a chunk."""
    from maritime_activity_reports_cdc_ray.functions.dedup import SimHasher

    sh = SimHasher()
    rng = np.random.default_rng(3)
    sig = np.uint64(sh.simhash64("some representative document text here"))
    # generate signatures at hamming distance exactly 8, check chunk sharing
    for _ in range(50):
        flip = rng.choice(64, size=8, replace=False)
        other = sig
        for f in flip:
            other = other ^ (np.uint64(1) << np.uint64(f))
        w = 64 // 9
        shared = any(
            (sig >> np.uint64(b * w)) & np.uint64((1 << w) - 1)
            == (other >> np.uint64(b * w)) & np.uint64((1 << w) - 1)
            for b in range(9))
        assert shared


def test_driver_contract_registry_alignment():
    """Every registered query has an oracle (zero rows-only) and the registry
    holds exactly 50 entries — the driver snapshot window measured in round 2."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_entry_contract_check",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q, o = mod.queries(), mod.oracle_sql()
    assert len(q) == 50
    assert set(q) == set(o)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_restore_rolls_back_and_replay_reconverges(ray_session, tmp_path):
    """Delta RESTORE analogue: silver+gold roll back to the as-of state as a
    NEW manifest version (nothing deleted); bronze stays, so re-running the
    replay re-applies the later epochs and reconverges bit-for-bit."""
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

    events = _mini_stream(tmp_path)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=2, commit_regex=r"^c[0-9]{3}$"))
    r.setup()
    r.run(events)

    def snap():
        sil = (r.read_silver(columns=["repo", "path", "content"]).to_pandas()
               .sort_values(["repo", "path"]).reset_index(drop=True))
        gold = (r.read_gold().to_pandas().drop(columns=["lang_counts"])
                .sort_values("repo").reset_index(drop=True))
        return sil, gold

    final_sil, final_gold = snap()
    v_before = r.silver.latest_manifest().version

    out = r.restore(0)
    assert out == {"silver_epoch": 0, "gold_epoch": 0}
    # a restore is an appended version, not history rewriting
    assert r.silver.latest_manifest().version == v_before + 1
    sil0 = r.read_silver(columns=["repo", "path", "content"]).to_pandas()
    got = dict(zip(sil0.repo + "/" + sil0.path, sil0.content))
    assert got == {"r1/a.py": "v0", "r2/b.py": "w0"}
    assert len(r.read_history().to_pandas()) == 0  # no closed versions yet
    # FORWARD time travel still works after the rollback: the epoch-2
    # manifest is undeleted and must not be shadowed by the higher-version
    # restore manifest (exact-epoch match beats the version order)
    fwd = r.read_silver(columns=["repo", "path", "content"],
                        as_of_epoch=2).to_pandas()
    gotf = dict(zip(fwd.repo + "/" + fwd.path, fwd.content))
    assert gotf == {"r1/a.py": "v2", "r2/b.py": "w0"}
    # idempotent: restoring to the same state is a no-op version-wise
    v = r.silver.latest_manifest().version
    r.restore(0)
    assert r.silver.latest_manifest().version == v

    # bronze kept the later epochs: replay re-applies and reconverges
    res = r.run(events)
    assert res["epochs_run"] == 2
    sil2, gold2 = snap()
    pd.testing.assert_frame_equal(sil2, final_sil)
    pd.testing.assert_frame_equal(gold2, final_gold)
    # the restored chain remains time-travelable after reconvergence
    df = r.read_silver(columns=["repo", "path", "content"], as_of_epoch=1).to_pandas()
    got1 = dict(zip(df.repo + "/" + df.path, df.content))
    assert got1 == {"r1/a.py": "v1", "r2/b.py": "w0"}
