"""Append-mode windowed streaming aggregation (Spark withWatermark + window
semantics). Contract:

- after the final flush, emitted rows == a full batch group-by over BRONZE
  (the validated stream) by (tumbling window, lang) — counts and sums;
- append-only: a (window, group) row emitted at refresh k never reappears
  or changes in any later refresh;
- windows emit only when the event-time watermark passes their end — while
  the stream runs, no open window is ever in results;
- refresh is watermark-guarded (re-refresh no-ops) and a fresh consumer
  object resumes from the persisted state.
"""

from __future__ import annotations

import pandas as pd

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay
from maritime_activity_reports_cdc_ray.pipelines.streaming import StreamingWindowAgg

SIZE = 40


def _expected(r) -> pd.DataFrame:
    import ray.data as rd

    bm = r.bronze.latest_manifest()
    files = [r.bronze.abspath(f.path) for f in bm.fragments if f.kind == "data"]
    b = rd.read_parquet(files, columns=["event_time", "lang",
                                        "content_bytes"]).to_pandas()
    b["window_start"] = b["event_time"] // SIZE * SIZE
    exp = (b.groupby(["window_start", "lang"], as_index=False)
           .agg(n=("lang", "size"), sum_content_bytes=("content_bytes", "sum")))
    exp["window_end"] = exp["window_start"] + SIZE
    return exp.sort_values(["window_start", "lang"]).reset_index(drop=True)


def _key(df):
    return set(zip(df["window_start"], df["lang"]))


def test_streaming_window_append_mode(ray_session, tmp_path):
    d = str(tmp_path / "stream")
    generate_events(d, n_events=3000, n_repos=8, n_epochs=3, seed=29)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=50))
    r.setup()
    w = StreamingWindowAgg(r, "lang_windows", SIZE, ["lang"],
                           sum_cols=["content_bytes"])
    seen: dict = {}
    for _ in range(3):
        r.run(d, max_epochs=1)
        out = w.refresh()
        assert out["status"] == "refreshed"
        res = w.results()
        # append-only: previously emitted rows unchanged
        for k, (n, s) in seen.items():
            row = res[(res["window_start"] == k[0]) & (res["lang"] == k[1])]
            assert len(row) == 1 and int(row["n"].iloc[0]) == n \
                and int(row["sum_content_bytes"].iloc[0]) == s
        assert len(res) == len(_key(res))  # no duplicate emits
        seen = {k: (int(n), int(s)) for k, n, s in zip(
            _key(res) and zip(res["window_start"], res["lang"]),
            res["n"], res["sum_content_bytes"])}
        # no open window leaked into results
        assert not (_key(res) & _key(w.state()))
        # watermark-guarded no-op
        assert w.refresh()["status"] == "fresh"
        # finalized windows are closed w.r.t. the floor
        floor = r._watermark_floor()
        if floor is not None and len(res):
            assert (res["window_end"] <= floor).all()
    # resume from disk with a fresh consumer, then end-of-stream flush
    w2 = StreamingWindowAgg(r, "lang_windows", SIZE, ["lang"],
                            sum_cols=["content_bytes"])
    w2.flush()
    assert w2.flush()["emitted"] == 0  # idempotent
    got = (w2.results().sort_values(["window_start", "lang"])
           .reset_index(drop=True))
    exp = _expected(r)
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert got["n"].astype("int64").tolist() == exp["n"].tolist()
    assert got["sum_content_bytes"].astype("int64").tolist() == \
        exp["sum_content_bytes"].tolist()
    assert got["window_end"].astype("int64").tolist() == \
        exp["window_end"].tolist()
    assert len(w2.state()) == 0


def test_streaming_window_null_event_time_excluded(ray_session, tmp_path):
    """A null event_time row admitted by the validator (null is not late)
    must not wedge the consumer: it is excluded from windowed aggregation
    (Spark: null timestamps fall out of the window groupby)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=800, n_repos=5, n_epochs=2, seed=47,
                            p_delay=0.0)
    for ei, f in enumerate(files):
        t = pq.read_table(f)
        et = [ei * 100_000 + i for i in range(t.num_rows)]
        et[0] = None  # one null event_time per epoch
        t = t.append_column("event_time", pa.array(et, pa.int64()))
        pq.write_table(t, f)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=50))
    r.setup()
    r.run(d)
    w = StreamingWindowAgg(r, "nulls", 1000, ["lang"])
    assert w.refresh()["status"] == "refreshed"  # must not raise
    w.flush()
    res = w.results()
    # total n = bronze rows with non-null event_time
    import ray.data as rd

    bm = r.bronze.latest_manifest()
    b = rd.read_parquet([r.bronze.abspath(f.path) for f in bm.fragments
                         if f.kind == "data"],
                        columns=["event_time"]).to_pandas()
    assert int(res["n"].sum()) == int(b["event_time"].notna().sum())
    assert b["event_time"].isna().sum() == 2


def test_streaming_window_crash_mid_commit_recovers(ray_session, tmp_path):
    """A refresh interrupted after writing its version dir but before the
    LATEST flip reruns and converges — no double-emit, no lost windows."""
    import os

    d = str(tmp_path / "stream")
    generate_events(d, n_events=1200, n_repos=6, n_epochs=2, seed=53)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=40))
    r.setup()
    r.run(d, max_epochs=1)
    w = StreamingWindowAgg(r, "crash", SIZE, ["lang"])
    w.refresh()
    r.run(d)
    # simulate the crashed refresh-to-epoch-1: corrupt future vdir, stale LATEST
    vdir = os.path.join(w.dir, f"v{1:010d}")
    os.makedirs(vdir)
    open(os.path.join(vdir, "results.parquet"), "w").write("garbage")
    open(os.path.join(vdir, "state.parquet"), "w").write("garbage")
    open(os.path.join(vdir, "meta.json"), "w").write("{}")
    assert int(w._meta()["epoch"]) == 0
    out = w.refresh()
    assert out["status"] == "refreshed"
    w.flush()
    got = (w.results().sort_values(["window_start", "lang"])
           .reset_index(drop=True))
    exp = _expected(r)
    assert got["n"].astype("int64").tolist() == exp["n"].tolist()
    assert len(got) == len(_key(got))  # still no duplicate emits


def test_flush_is_terminal(ray_session, tmp_path):
    """flush() commits a terminal flag: a later refresh() after new bronze
    epochs raises instead of re-emitting already-finalized (window, group)
    rows (append-exactly-once); flush itself is idempotent."""
    import pytest

    d = str(tmp_path / "stream")
    generate_events(d, n_events=1500, n_repos=6, n_epochs=3, seed=31)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=50))
    r.setup()
    r.run(d, max_epochs=2)
    w = StreamingWindowAgg(r, "w_term", SIZE, ["lang"])
    w.refresh()
    out = w.flush()
    assert out["status"] == "flushed"
    n_res = len(w.results())
    assert w.flush() == {"status": "flushed", "emitted": 0}  # idempotent
    assert len(w.results()) == n_res
    r.run(d)  # a 3rd bronze epoch lands after the flush
    with pytest.raises(RuntimeError, match="flushed"):
        w.refresh()
    # a FRESH consumer object on the same name sees the same terminal state
    with pytest.raises(RuntimeError, match="flushed"):
        StreamingWindowAgg(r, "w_term", SIZE, ["lang"]).refresh()
    assert len(w.results()) == n_res


def test_null_group_keys_are_real_groups(ray_session, tmp_path):
    """Rows whose group column is NULL aggregate into a real NULL-keyed
    window group (Spark groupBy keeps null keys), instead of silently
    vanishing through pandas' dropna."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "stream")
    os.makedirs(d)

    def row(repo, path, commit, lang):
        return pa.table({
            "repo": pa.array([repo], pa.string()),
            "path": pa.array([path], pa.string()),
            "commit": pa.array([commit], pa.string()),
            "lang": pa.array([lang], pa.string()),
            "content": pa.array(["x"], pa.large_string()),
        })

    e0 = pa.concat_tables([
        row("r1", "a", "c000000000010", None),
        row("r1", "b", "c000000000020", None),
        row("r2", "a", "c000000000030", "py"),
    ])
    pq.write_table(e0, os.path.join(d, "part-00000.parquet"))
    pq.write_table(row("r3", "z", "c000000001000", "py"),
                   os.path.join(d, "part-00001.parquet"))

    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=50))
    r.setup()
    r.run(d)
    w = StreamingWindowAgg(r, "w_null", SIZE, ["lang"])
    w.refresh()
    res = w.flush() and w.results()
    win0 = res[res["window_start"] == 0]
    nullg = win0[win0["lang"].isna()]
    assert len(nullg) == 1 and int(nullg["n"].iloc[0]) == 2
    pyg = win0[win0["lang"] == "py"]
    assert len(pyg) == 1 and int(pyg["n"].iloc[0]) == 1


def test_results_segments_append_only_hard_links(ray_session, tmp_path):
    """Per-refresh result cost is O(emitted this refresh): previously
    emitted segments carry over as hard links (same inode), never
    rewritten, and results() still returns the full append-only table."""
    import os

    d = str(tmp_path / "stream")
    generate_events(d, n_events=3000, n_repos=8, n_epochs=3, seed=31)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4, watermark_delay=50))
    r.setup()
    w = StreamingWindowAgg(r, "seg", SIZE, ["lang"],
                           sum_cols=["content_bytes"])
    inodes: dict = {}
    for _ in range(3):
        r.run(d, max_epochs=1)
        w.refresh()
        segs = w._result_segments(w._latest())
        for f in segs:
            b = os.path.basename(f)
            if b in inodes:
                assert os.stat(f).st_ino == inodes[b], \
                    "an emitted segment was rewritten"
            inodes[b] = os.stat(f).st_ino
    w.flush()
    got = w.results()
    exp = _expected(r)
    got = got.sort_values(["window_start", "lang"]).reset_index(drop=True)
    assert got["n"].astype("int64").tolist() == exp["n"].tolist()
    assert got["sum_content_bytes"].astype("int64").tolist() == \
        exp["sum_content_bytes"].tolist()
