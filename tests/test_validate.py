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
