"""Quality scoring tiers + hard-invalid filtering (reference:
utils/data_quality.py:20-99 tiers; tests/test_bronze_layer.py:162-207)."""

import pyarrow as pa

from maritime_activity_reports_cdc_ray.config import EngineConfig
from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE
from maritime_activity_reports_cdc_ray.stages.stamp import make_stamper
from maritime_activity_reports_cdc_ray.stages.validate import make_validator, quality_columns

CFG = EngineConfig()


def _stamped(rows):
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.large_string()),
        }
    )
    return make_stamper(CFG, 0)(t)


def test_quality_tiers():
    rows = [
        ("r", "a", "c000000000001", "py", "good"),            # EXCELLENT
        ("r", "b", "c000000000002", "weird", "soft lang"),    # GOOD (1 soft)
        ("r", "c", "c000000000003", "weird", "x" * (CFG.max_content_bytes + 1)),  # FAIR (2 soft)
        ("", "d", "c000000000004", "py", "bad key"),          # INVALID (hard)
        ("r", "e", "not-a-commit", "py", "bad commit"),       # INVALID (hard)
        ("r", "f", "c000000000006", "", TOMBSTONE),           # tombstone: EXCELLENT
    ]
    scored, hard = quality_columns(_stamped(rows), CFG)
    scores = scored.column("data_quality_score").to_pylist()
    cats = scored.column("quality_category").to_pylist()
    assert scores == [1.0, 0.8, 0.6, 0.0, 0.0, 1.0]
    assert cats == ["EXCELLENT", "GOOD", "FAIR", "INVALID", "INVALID", "EXCELLENT"]
    assert hard.to_pylist() == [True, True, True, False, False, True]


def test_validator_drops_hard_invalid():
    rows = [
        ("r", "a", "c000000000001", "py", "good"),
        ("", "b", "c000000000002", "py", "bad"),
    ]
    out = make_validator(CFG)(_stamped(rows))
    assert out.num_rows == 1 and out.column("path").to_pylist() == ["a"]


def test_dirty_stream_filtering(tmp_path):
    files = generate_events(str(tmp_path / "d"), n_events=2000, n_repos=8, n_epochs=2,
                            seed=42, dirty_fraction=0.05)
    import pyarrow.parquet as pq

    total_in = total_out = 0
    for e, fp in enumerate(files):
        t = pq.read_table(fp)
        total_in += t.num_rows
        total_out += make_validator(CFG)(make_stamper(CFG, e)(t)).num_rows
    assert total_out < total_in          # hard-invalid rows dropped
    assert total_out > 0.9 * total_in    # but only the hard-invalid ones


def test_check_constraint_drop_and_null_semantics():
    """Declarative CHECK constraints (Delta ADD CONSTRAINT analogue):
    policy='drop' filters violating rows; SQL null semantics (NULL satisfies
    every op except not_null)."""
    cfg = EngineConfig(check_constraints=(
        ("lang_known", "lang", "in", ("py", "rs"), "drop"),
        ("small", "content_bytes", "<=", 10, "drop"),
    ))
    rows = [
        ("r", "a", "c000000000001", "py", "ok"),          # passes both
        ("r", "b", "c000000000002", "go", "ok"),          # fails lang_known
        ("r", "c", "c000000000003", "py", "x" * 50),      # fails small
        ("r", "d", "c000000000004", "", TOMBSTONE),       # lang "" fails in
    ]
    out = make_validator(cfg)(_stamped(rows))
    assert sorted(out.column("path").to_pylist()) == ["a"]
    # not_null vs comparison null semantics
    cfg2 = EngineConfig(check_constraints=(
        ("has_lang", "lang", "not_null", None, "drop"),))
    t = _stamped([("r", "a", "c000000000001", "py", "ok")])
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.array([None], pa.string()))
    assert make_validator(cfg2)(t).num_rows == 0  # not_null drops NULL
    cfg3 = EngineConfig(check_constraints=(
        ("lang_eq", "lang", "==", "py", "drop"),))
    assert make_validator(cfg3)(t).num_rows == 1  # NULL satisfies ==


def test_check_constraint_fail_aborts_before_commit(ray_session, tmp_path):
    """policy='fail' aborts the epoch BEFORE any commit; repairing the config
    and rerunning converges exactly-once to the full oracle state."""
    import pytest

    from maritime_activity_reports_cdc_ray.oracle import replay_files
    from maritime_activity_reports_cdc_ray.pipelines import CDCReplay
    from maritime_activity_reports_cdc_ray.stages.validate import ConstraintViolation
    from tests.test_e2e_replay import _assert_matches_oracle

    d = str(tmp_path / "stream")
    files = generate_events(d, n_events=900, n_repos=5, n_epochs=2, seed=9)
    lake = str(tmp_path / "lake")
    strict = EngineConfig(num_partitions=4, check_constraints=(
        ("impossible", "content_bytes", "<", 0, "fail"),))
    r = CDCReplay(lake, strict)
    r.setup()
    with pytest.raises(Exception) as ei:
        r.run(d)
    assert "impossible" in str(ei.value)
    assert r.silver.latest_manifest().epoch == -1  # nothing committed
    # repair: drop the constraint, rerun from scratch state — full convergence
    r2 = CDCReplay(lake, EngineConfig(num_partitions=4))
    out = r2.run(d)
    assert out["epochs_run"] == 2
    _assert_matches_oracle(r2, replay_files(files))


def test_check_constraint_quarantine_reason(ray_session, tmp_path):
    """Dropped check-violating rows land in the dead-letter table with
    reason='check:<name>' (quality reasons keep precedence)."""
    from maritime_activity_reports_cdc_ray.pipelines import CDCReplay

    d = str(tmp_path / "stream")
    generate_events(d, n_events=600, n_repos=4, n_epochs=1, seed=5)
    cfg = EngineConfig(num_partitions=4, quarantine_rejects=True,
                       check_constraints=(
                           ("only_py", "lang", "in", ("py",), "drop"),))
    r = CDCReplay(str(tmp_path / "lake"), cfg)
    r.setup()
    r.run(d)
    q = r.read_quarantine().to_pandas()
    assert len(q) > 0
    assert set(q["reject_reason"]) == {"check:only_py"}
    sil = r.read_silver().to_pandas()
    assert set(sil["lang"]) <= {"py"}


def test_check_constraint_in_null_satisfies():
    """NULL satisfies the 'in' op (pc.is_in alone returns false for nulls —
    regression for the OR-is_null fix)."""
    cfg = EngineConfig(check_constraints=(
        ("lang_known", "lang", "in", ("py", "rs"), "drop"),))
    t = _stamped([("r", "a", "c000000000001", "py", "ok")])
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.array([None], pa.string()))
    assert make_validator(cfg)(t).num_rows == 1


def test_check_constraint_fail_ignores_dropped_rows():
    """policy='fail' applies Delta write-time semantics: a row validation
    drops anyway (hard-invalid) must not abort the epoch even if it also
    violates the constraint."""
    cfg = EngineConfig(check_constraints=(
        ("small", "content_bytes", "<=", 3, "fail"),))
    rows = [
        ("r", "a", "c000000000001", "py", "ok"),        # passes
        ("", "b", "c000000000002", "py", "x" * 50),     # hard-invalid AND >3
    ]
    out = make_validator(cfg)(_stamped(rows))  # must NOT raise
    assert out.column("path").to_pylist() == ["a"]
    # but a LANDING row violating it still aborts
    import pytest

    from maritime_activity_reports_cdc_ray.stages.validate import ConstraintViolation
    rows2 = [("r", "a", "c000000000001", "py", "x" * 50)]
    with pytest.raises(ConstraintViolation):
        make_validator(cfg)(_stamped(rows2))
