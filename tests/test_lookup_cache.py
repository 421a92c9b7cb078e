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
