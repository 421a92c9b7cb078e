"""StreamSupervisor: monitor/auto-restart semantics (reference
silver/streaming_processor.py:193-235 monitor loop + :254-277 restart).

The dead-query analogue is a replay whose run() raises mid-stream; the
supervisor must capture the exception in its restart history, rebuild a
FRESH driver object from the factory, and converge to the dict oracle —
exactly-once (2PC manifests) makes the restart safe."""

import json
import os
import subprocess
import sys

import pytest

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.oracle import replay_files
from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay
from maritime_activity_reports_cdc_ray.pipelines.supervisor import StreamSupervisor


class _FlakyReplay(CDCReplay):
    """run() raises the first ``fail_first`` times ACROSS INSTANCES, after
    committing one epoch — a mid-stream death, not a clean no-op."""

    _fails_left = 0

    def run(self, *a, **kw):
        if type(self)._fails_left > 0:
            super().run(*a, **{**kw, "max_epochs": 1})  # die mid-stream
            type(self)._fails_left -= 1
            raise RuntimeError("injected stream death")
        return super().run(*a, **kw)


def _oracle_live(oracle):
    return oracle.expected_silver()


def test_supervisor_restarts_dead_run_and_converges(ray_session, tmp_path):
    d = str(tmp_path / "events")
    files = generate_events(d, n_events=3000, n_repos=8, n_epochs=3, seed=3)
    oracle = replay_files(files)
    lake = str(tmp_path / "lake")
    CDCReplay(lake, EngineConfig(num_partitions=2)).setup()

    _FlakyReplay._fails_left = 2
    fresh = []

    def factory():
        r = _FlakyReplay(lake, EngineConfig(num_partitions=2))
        fresh.append(r)
        return r

    sup = StreamSupervisor(factory, d, poll_interval=0.0, max_restarts=3)
    out = sup.run(stop_when_idle=True)

    assert out["restarts"] == 2
    assert all("injected stream death" in h["exception"]
               for h in out["restart_history"])
    assert len(fresh) == 3  # initial + one fresh driver per restart
    assert out["metrics"]["status"] == "idle"
    assert out["metrics"]["silver_epoch"] == 2
    # state converged exactly-once despite two mid-stream deaths
    sil = sup.replay.read_silver().to_pandas()
    exp = _oracle_live(oracle)
    assert len(sil) == len(exp)
    for row in sil.itertuples():
        assert exp[(row.repo, row.path)]["commit"] == row.commit


def test_supervisor_exhausts_restarts_loudly(ray_session, tmp_path):
    d = str(tmp_path / "events")
    generate_events(d, n_events=400, n_repos=3, n_epochs=1, seed=4)
    lake = str(tmp_path / "lake")
    CDCReplay(lake, EngineConfig(num_partitions=2)).setup()

    class _DeadReplay(CDCReplay):
        def run(self, *a, **kw):
            raise RuntimeError("permanently dead")

    sup = StreamSupervisor(lambda: _DeadReplay(lake, EngineConfig(num_partitions=2)),
                           d, poll_interval=0.0, max_restarts=2)
    with pytest.raises(RuntimeError, match="failed 3 consecutive times"):
        sup.poll_once()
    assert len(sup.restart_history) == 3


def test_supervisor_picks_up_files_appearing_between_polls(ray_session, tmp_path):
    """File-source micro-batch semantics: epochs written AFTER the stream
    drains are discovered and replayed by a later poll."""
    d = str(tmp_path / "events")
    # p_delay=0: delayed delivery would make epoch N-1's file depend on
    # whether it is the LAST epoch, breaking the byte-identical-prefix
    # property the mid-stream regeneration below relies on
    generate_events(d, n_events=1000, n_repos=5, n_epochs=2, seed=5, p_delay=0.0)
    lake = str(tmp_path / "lake")
    CDCReplay(lake, EngineConfig(num_partitions=2)).setup()

    sup = StreamSupervisor(lambda: CDCReplay(lake, EngineConfig(num_partitions=2)),
                           d, poll_interval=0.0)
    sup.run(stop_when_idle=True)
    assert sup.replay.stream_metrics()["silver_epoch"] == 1
    idle = sup.poll_once()
    assert not idle["ran"]  # nothing pending

    # a third epoch arrives mid-stream — regenerate the full stream
    # deterministically; epochs 0-1 are byte-identical so only part-00002 is new
    files = generate_events(d, n_events=1500, n_repos=5, n_epochs=3, seed=5,
                            p_delay=0.0)
    oracle = replay_files(files)
    rec = sup.poll_once()
    assert rec["ran"] and rec["epochs_run"] == 1
    sil = sup.replay.read_silver().to_pandas()
    exp = _oracle_live(oracle)
    assert len(sil) == len(exp)


def test_supervisor_steps_decoupled_gold(ray_session, tmp_path):
    """A fully-decoupled lake (gold_refresh_every_epochs=0): replay.run never
    advances gold, so the supervisor must step the GoldConsumer itself — and
    without manage_gold the lag must NOT read as pending work (livelock)."""
    d = str(tmp_path / "events")
    generate_events(d, n_events=900, n_repos=4, n_epochs=2, seed=7)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=2, gold_refresh_every_epochs=0)
    CDCReplay(lake, cfg).setup()

    sup = StreamSupervisor(lambda: CDCReplay(lake, cfg), d, poll_interval=0.0)
    out = sup.run(stop_when_idle=True)
    m = out["metrics"]
    assert m["silver_epoch"] == 1 and m["gold_epoch"] == 1  # consumer stepped
    assert m["status"] == "idle"

    # hands-off supervisor on a lagging-gold lake: not pending, no livelock
    lake2 = str(tmp_path / "lake2")
    CDCReplay(lake2, cfg).setup()
    sup2 = StreamSupervisor(lambda: CDCReplay(lake2, cfg), d,
                            poll_interval=0.0, manage_gold=False)
    out2 = sup2.run(stop_when_idle=True)
    m2 = out2["metrics"]
    assert m2["silver_epoch"] == 1 and m2["gold_epoch"] < 1
    assert not sup2.poll_once()["ran"]  # gold lag alone is not its work


def test_supervisor_restarts_failed_gold_consumer(ray_session, tmp_path):
    """A transient gold-consumer failure gets the SAME capture/restart
    discipline as a dead replay (review regression: it used to propagate
    uncaught, consuming none of max_restarts)."""
    d = str(tmp_path / "events")
    generate_events(d, n_events=600, n_repos=3, n_epochs=1, seed=8)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=2, gold_refresh_every_epochs=0)
    CDCReplay(lake, cfg).setup()

    class _GoldFlaky(CDCReplay):
        _fails_left = 1

        def _gold_refresh_inner(self, *a, **kw):
            if type(self)._fails_left > 0:
                type(self)._fails_left -= 1
                raise RuntimeError("injected gold death")
            return super()._gold_refresh_inner(*a, **kw)

    sup = StreamSupervisor(lambda: _GoldFlaky(lake, cfg), d,
                           poll_interval=0.0, max_restarts=2)
    out = sup.run(stop_when_idle=True)
    assert out["restarts"] == 1
    assert out["restart_history"][0]["stage"] == "gold-consumer"
    m = out["metrics"]
    assert m["gold_epoch"] == m["silver_epoch"] == 0


def test_supervise_cli(ray_session, tmp_path):
    d = str(tmp_path / "events")
    generate_events(d, n_events=800, n_repos=4, n_epochs=2, seed=6)
    lake = str(tmp_path / "lake")
    subprocess.run([sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli",
                    "setup", "--root", lake], capture_output=True, check=True)
    cp = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli", "supervise",
         "--root", lake, "--input", d, "--poll-interval", "0"],
        capture_output=True, text=True, check=True)
    out = json.loads(cp.stdout)
    assert out["epochs_run"] == 2 and out["restarts"] == 0
    assert out["metrics"]["status"] == "idle"
