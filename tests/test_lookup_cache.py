"""G4 lookup-cache operator: MERGE-style counter upsert, hit/miss accounting,
persistence + exactly-once across epochs (reference
silver/streaming_processor.py:150-191, DDL silver/table_setup.py:226-272)."""

import pandas as pd
import pyarrow as pa
import pytest

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay
from maritime_activity_reports_cdc_ray.state.cache import LookupCache


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


SCHEMA = pa.schema([("k", pa.string()), ("zone", pa.string())])


def test_upsert_hit_miss_counters(ray_session, tmp_path):
    c = LookupCache.create(str(tmp_path / "c"), ["k"], SCHEMA, num_partitions=4)
    # epoch 0: all misses; duplicates within an epoch count once (the
    # reference distincts the batch before MERGE)
    r0 = c.upsert_epoch(_ds(pd.DataFrame({"k": ["a", "b", "a", "c"],
                                          "zone": ["Z1", "Z2", "Z1", "Z3"]})), 0)
    assert r0 == {"hits": 0, "misses": 3, "skipped": False}
    # epoch 1: two hits, one new key
    r1 = c.upsert_epoch(_ds(pd.DataFrame({"k": ["a", "c", "d"],
                                          "zone": ["Z1", "Z3", "Z4"]})), 1)
    assert r1 == {"hits": 2, "misses": 1, "skipped": False}
    out = c.read().to_pandas().set_index("k").sort_index()
    assert out.loc["a", "access_count"] == 2
    assert out.loc["a", "first_seen_epoch"] == 0
    assert out.loc["a", "last_accessed_epoch"] == 1
    assert out.loc["b", "access_count"] == 1
    assert out.loc["b", "last_accessed_epoch"] == 0
    assert out.loc["d", "first_seen_epoch"] == 1
    # payload kept from first insert
    assert out.loc["d", "zone"] == "Z4"
    assert c.stats() == {"hits": 2, "misses": 4}


def test_upsert_exactly_once_and_persistence(ray_session, tmp_path):
    root = str(tmp_path / "c")
    c = LookupCache.create(root, ["k"], SCHEMA, num_partitions=2)
    c.upsert_epoch(_ds(pd.DataFrame({"k": ["a"], "zone": ["Z"]})), 0)
    # replaying a committed epoch never double-bumps
    again = c.upsert_epoch(_ds(pd.DataFrame({"k": ["a"], "zone": ["Z"]})), 0)
    assert again["skipped"]
    # a fresh handle (new process analogue) sees the committed state
    c2 = LookupCache(root)
    assert c2.read().to_pandas().loc[0, "access_count"] == 1
    c2.upsert_epoch(_ds(pd.DataFrame({"k": ["a"], "zone": ["Z"]})), 1)
    assert c2.read().to_pandas().loc[0, "access_count"] == 2
    # vacuum drops superseded fragments, state unchanged
    assert c2.table.vacuum() > 0
    assert c2.read().to_pandas().loc[0, "access_count"] == 2


def test_replay_maintains_cache(ray_session, tmp_path):
    """CDCReplay with lookup_cache_keys MERGEs each epoch's distinct
    (repo, path) into <lake>/cache, exactly-once across reruns."""
    d = tmp_path / "stream"
    files = generate_events(str(d), n_events=800, n_repos=6, n_epochs=3, seed=7)
    cfg = EngineConfig(num_partitions=4, lookup_cache_keys=("repo", "path"))
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(str(d))
    cache = r.cache()
    df = cache.read().to_pandas()
    # one row per distinct key ever seen in bronze
    import pyarrow.parquet as pq

    seen = pd.concat([pq.read_table(f, columns=["repo", "path"]).to_pandas()
                      for f in files]).drop_duplicates()
    # cache keys == bronze keys that survived validation (subset of raw)
    assert len(df) <= len(seen)
    assert cache.table.latest_manifest().epoch == 2
    # access_count == number of epochs the key appeared in (1..3)
    assert df.access_count.between(1, 3).all()
    assert (df.first_seen_epoch <= df.last_accessed_epoch).all()
    total = int(df.access_count.sum())
    # rerun is a no-op: counters unchanged
    r.run(str(d))
    assert int(r.cache().read().to_pandas().access_count.sum()) == total


def test_cache_schema_requires_keys(tmp_path):
    with pytest.raises(AssertionError):
        LookupCache.create(str(tmp_path / "x"), ["missing"], SCHEMA)


def test_cross_epoch_content_dedup_via_lookup_cache(ray_session, tmp_path):
    """Streaming corpus dedup at ingest: keying the lookup cache by
    ``content_sha256`` turns it into an incremental content-fingerprint
    index — after each epoch, access_count > 1 identifies content already
    seen anywhere earlier in the stream (cross-KEY, cross-EPOCH), and
    first_seen_epoch is the dedup watermark. No new code path: the MERGE
    cache + the stamped bronze column compose."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from maritime_activity_reports_cdc_ray import EngineConfig
    from maritime_activity_reports_cdc_ray.generate import generate_events
    from maritime_activity_reports_cdc_ray.pipelines import CDCReplay

    events = tmp_path / "events"
    generate_events(str(events), n_events=1200, n_repos=6, n_epochs=2, seed=7)
    f0, f1 = sorted(str(p) for p in events.iterdir())
    # engineer cross-key duplicate content: epoch-1 rows 0..19 reuse epoch-0
    # content under different (repo, path)
    d0 = pq.read_table(f0).to_pandas()
    d1 = pq.read_table(f1).to_pandas()
    src = d0["content"].head(20).tolist()
    d1.loc[: len(src) - 1, "content"] = src
    d1.loc[: len(src) - 1, "path"] = [f"dup/copy_{i}.txt" for i in range(len(src))]
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(d1, preserve_index=False), f1)

    cfg = EngineConfig(num_partitions=4,
                       lookup_cache_keys=("content_sha256",))
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(str(events))

    cache = r.cache().read().to_pandas()
    # dict oracle over the raw files. MERGE semantics: keys are DISTINCTed
    # per epoch before the upsert (the reference's .distinct() before MERGE),
    # so access_count = number of EPOCHS the content appeared in.
    from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE

    sha = lambda s: hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest()
    seen: dict = {}
    for e, d in enumerate([d0, d1]):
        live = d[~((d["content"] == TOMBSTONE)
                   & (d["lang"].fillna("") == ""))]
        for h in {sha(c) for c in live["content"]}:
            if h in seen:
                seen[h][0] += 1
            else:
                seen[h] = [1, e]
    kcol = cache.columns[0]
    live_cache = cache[cache[kcol].notna()]
    got = {getattr(r_, kcol): (int(r_.access_count), int(r_.first_seen_epoch))
           for r_ in live_cache.itertuples()}
    assert len(got) == len(seen)
    dups = {h for h, (n, _) in seen.items() if n > 1}
    assert dups, "engineered duplicates must exist"
    for h, (n, e) in seen.items():
        assert got[h] == (n, e), h
    # exactly-once under replay: the counters never double-bump
    r.run(str(events))
    cache2 = r.cache().read().to_pandas()
    pd.testing.assert_frame_equal(
        cache.sort_values(cache.columns[0]).reset_index(drop=True),
        cache2.sort_values(cache.columns[0]).reset_index(drop=True))
