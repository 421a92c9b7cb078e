"""Randomized end-to-end differentials over the round-5 surfaces (compact
in-suite versions of the wider fuzz sweeps run during development — 55 IVM,
35 jaccard, 8+8 streaming/gold trials, zero failures):

- StreamingWindowAgg under a RANDOM interleave of replay epochs, refreshes,
  restarts and no-ops must, after flush, equal a batch recompute over bronze
  — and never lose an already-emitted row (append-only segments).
- A decoupled GoldConsumer advanced by a random mix of step()/refresh()
  calls must converge to the same gold state as an inline-cadence lake over
  the same stream.
"""

from __future__ import annotations

import random

import ray.data as rd

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay
from maritime_activity_reports_cdc_ray.pipelines.gold_consumer import GoldConsumer
from maritime_activity_reports_cdc_ray.pipelines.streaming import StreamingWindowAgg


def test_streaming_window_random_interleave(ray_session, tmp_path):
    for seed in (3001, 3005):
        rng = random.Random(seed)
        d = str(tmp_path / f"s{seed}")
        n_ep = rng.randint(2, 3)
        generate_events(d, n_events=rng.randint(400, 1500),
                        n_repos=rng.randint(3, 8), n_epochs=n_ep, seed=seed)
        size = rng.choice([7, 40])
        r = CDCReplay(str(tmp_path / f"lake{seed}"),
                      EngineConfig(num_partitions=2,
                                   watermark_delay=rng.choice([10, 50])))
        r.setup()
        w = StreamingWindowAgg(r, "fz", size, ["lang"],
                               sum_cols=["content_bytes"])
        for _ in range(n_ep):
            r.run(d, max_epochs=1)
            if rng.random() < 0.8:
                if rng.random() < 0.3:  # restart analogue
                    w = StreamingWindowAgg(r, "fz", size, ["lang"],
                                           sum_cols=["content_bytes"])
                w.refresh()
                w.refresh()  # watermark no-op
        w.refresh()
        pre = w.results()
        w.flush()
        got = (w.results().groupby(["window_start", "lang"], as_index=False)
               .agg(n=("n", "sum"), s=("sum_content_bytes", "sum")))
        bm = r.bronze.latest_manifest()
        files = [r.bronze.abspath(f.path) for f in bm.fragments
                 if f.kind == "data"]
        b = rd.read_parquet(files, columns=["event_time", "lang",
                                            "content_bytes"]).to_pandas()
        b["window_start"] = b["event_time"] // size * size
        exp = (b.groupby(["window_start", "lang"], dropna=False,
                         as_index=False)
               .agg(n=("lang", "size"), s=("content_bytes", "sum")))
        m = got.merge(exp, on=["window_start", "lang"], how="outer",
                      suffixes=("_g", "_e"))
        assert len(got) == len(exp) and not m.isna().any().any(), seed
        assert (m.n_g == m.n_e).all() and (m.s_g == m.s_e).all(), seed
        if len(pre):
            assert set(zip(pre.window_start, pre.lang)) <= \
                set(zip(w.results().window_start, w.results().lang)), seed


def test_gold_consumer_random_interleave(ray_session, tmp_path):
    for seed in (4002, 4006):
        rng = random.Random(seed)
        d = str(tmp_path / f"s{seed}")
        n_ep = rng.randint(2, 3)
        generate_events(d, n_events=rng.randint(400, 1200),
                        n_repos=rng.randint(3, 8), n_epochs=n_ep,
                        seed=seed * 7)
        r = CDCReplay(str(tmp_path / f"lake{seed}"),
                      EngineConfig(num_partitions=2,
                                   gold_refresh_every_epochs=0))
        r.setup()
        gc = GoldConsumer(r)
        for _ in range(n_ep):
            r.run(d, max_epochs=1)
            if rng.random() < 0.5:
                (gc.step if rng.random() < 0.5 else gc.refresh)()
        gc.refresh()
        got = (r.read_gold().to_pandas()
               .sort_values("repo").reset_index(drop=True))
        r2 = CDCReplay(str(tmp_path / f"ref{seed}"),
                       EngineConfig(num_partitions=4))
        r2.setup()
        r2.run(d)
        exp = (r2.read_gold().to_pandas()
               .sort_values("repo").reset_index(drop=True))
        cols = ["repo", "file_count", "total_bytes", "total_versions",
                "deleted_count", "latest_commit"]
        assert got[cols].values.tolist() == exp[cols].values.tolist(), seed
