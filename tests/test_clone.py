"""SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW CLONE [VERSION AS OF]``
analogue): zero-copy, manifest-only lake clones.

Contract: the clone references the source's fragment files (no data moved),
reads identically (including the content-pointer silver join against the
cloned bronze), can be pinned AS OF an epoch, diverges independently on
subsequent runs, and its vacuum can never delete source data.
"""

from __future__ import annotations

import glob
import os
import shutil

from maritime_activity_reports_cdc_ray import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.oracle import replay_files
from maritime_activity_reports_cdc_ray.pipelines import CDCReplay

from tests.test_e2e_replay import _assert_matches_oracle


def _lake(tmp_path, files_dir):
    r = CDCReplay(str(tmp_path / "lake"), EngineConfig(num_partitions=4))
    r.setup()
    r.run(files_dir)
    return r


def test_clone_reads_identically_and_diverges(ray_session, tmp_path):
    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=1800, n_repos=8, n_epochs=3, seed=13)
    src = _lake(tmp_path, d)
    oracle_full = replay_files(files)

    clone = src.clone(str(tmp_path / "branch"))
    # zero data copied: the clone's fragment dirs are empty
    assert not glob.glob(os.path.join(str(tmp_path / "branch"), "*",
                                      "fragments", "**", "*.parquet"),
                         recursive=True)
    _assert_matches_oracle(clone, oracle_full)

    # divergence: one extra epoch applied to the CLONE only
    d2 = str(tmp_path / "stream2")
    os.makedirs(d2)
    for f in files:
        shutil.copy(f, d2)
    extra = generate_events(str(tmp_path / "extra"), n_events=600, n_repos=8,
                            n_epochs=1, seed=99)
    # name it AFTER the source's part-0000N files so it sorts as epoch 3
    shutil.copy(extra[0], os.path.join(d2, "part-00003.parquet"))
    clone.run(d2)
    assert clone.silver.latest_manifest().epoch == 3
    assert src.silver.latest_manifest().epoch == 2  # source untouched
    _assert_matches_oracle(src, oracle_full)
    d2_files = sorted(glob.glob(os.path.join(d2, "*.parquet")))
    _assert_matches_oracle(clone, replay_files(d2_files))


def test_clone_as_of_epoch_pins_history(ray_session, tmp_path):
    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=1800, n_repos=8, n_epochs=3, seed=21)
    src = _lake(tmp_path, d)
    clone = src.clone(str(tmp_path / "pin"), as_of_epoch=1)
    assert clone.silver.latest_manifest().epoch == 1
    _assert_matches_oracle(clone, replay_files(files[:2]))
    # the source still reads its full state
    _assert_matches_oracle(src, replay_files(files))


def test_clone_vacuum_cannot_touch_source(ray_session, tmp_path):
    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=1200, n_repos=6, n_epochs=2, seed=3)
    src = _lake(tmp_path, d)
    n_src_files = len(glob.glob(os.path.join(src.root, "*", "fragments",
                                             "**", "*.parquet"), recursive=True))
    clone = src.clone(str(tmp_path / "branch"))
    clone.silver.vacuum()
    clone.bronze.vacuum()
    clone.gold.vacuum()
    assert len(glob.glob(os.path.join(src.root, "*", "fragments", "**",
                                      "*.parquet"), recursive=True)) == n_src_files
    _assert_matches_oracle(src, replay_files(files))
    _assert_matches_oracle(clone, replay_files(files))


def test_describe_history_classifies_operations(ray_session, tmp_path):
    """DESCRIBE HISTORY analogue: newest-first manifest rows with inferred
    operations — create → append/merge per epoch, restore flagged, and a
    clone's v0 labeled 'clone'."""
    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=1200, n_repos=6, n_epochs=3, seed=31)
    src = _lake(tmp_path, d)
    src.restore(1)
    h = src.silver.describe_history()
    assert h[0]["operation"] == "restore" and h[0]["epoch"] == 1
    assert h[-1]["operation"] == "create" and h[-1]["epoch"] == -1
    assert [r["version"] for r in h] == sorted((r["version"] for r in h),
                                               reverse=True)
    ops = {r["operation"] for r in h}
    assert "merge" in ops or "append" in ops
    clone = src.clone(str(tmp_path / "branch"))
    ch = clone.silver.describe_history()
    assert len(ch) == 1 and ch[0]["operation"] == "clone"
    assert ch[0]["rows"] == h[0]["rows"]  # clone of the restored state
