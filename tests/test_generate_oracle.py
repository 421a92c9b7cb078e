"""Generator determinism + oracle semantics on handcrafted inputs."""

import glob
import hashlib

import pyarrow.parquet as pq

from maritime_activity_reports_cdc_ray.generate import generate_events
from maritime_activity_reports_cdc_ray.oracle import OracleState, replay_files
from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE


def _sha_of_files(files):
    h = hashlib.sha256()
    for f in files:
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def test_generator_deterministic(tmp_path):
    f1 = generate_events(str(tmp_path / "a"), n_events=800, n_repos=6, n_epochs=2, seed=7)
    f2 = generate_events(str(tmp_path / "b"), n_events=800, n_repos=6, n_epochs=2, seed=7)
    assert _sha_of_files(f1) == _sha_of_files(f2)
    f3 = generate_events(str(tmp_path / "c"), n_events=800, n_repos=6, n_epochs=2, seed=8)
    assert _sha_of_files(f1) != _sha_of_files(f3)


def test_generator_shape(tmp_path):
    files = generate_events(str(tmp_path / "ev"), n_events=500, n_repos=5, n_epochs=2, seed=42)
    assert len(files) == 2 and files == sorted(glob.glob(str(tmp_path / "ev" / "*.parquet")))
    t = pq.read_table(files[0])
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    commits = t.column("commit").to_pylist()
    assert all(c.startswith("c") and len(c) == 13 for c in commits)
    # tombstones exist and carry the sentinel encoding
    full = pq.read_table(files[0]).to_pylist() + pq.read_table(files[1]).to_pylist()
    tombs = [r for r in full if r["content"] == TOMBSTONE]
    assert tombs and all(r["lang"] == "" for r in tombs)


def test_oracle_lww_and_scd2():
    st = OracleState()
    ev = lambda r, p, c, lang, content: (r, p, c, lang, content)
    st.apply_epoch([
        ev("r", "a", "c003", "py", "v2"),
        ev("r", "a", "c001", "py", "v1"),  # applies first (sorted)
        ev("r", "b", "c002", "go", "w1"),
    ])
    assert st.keys[("r", "a")].version_count == 2
    assert st.keys[("r", "a")].commit == "c003"
    assert st.history_rows == 1  # v1 closed by c003
    # stale + duplicate in a later epoch
    st.apply_epoch([
        ev("r", "a", "c002", "py", "late"),   # stale (< c003)
        ev("r", "a", "c003", "py", "v2"),     # duplicate
        ev("r", "b", "c004", "", TOMBSTONE),  # delete
    ])
    assert st.stale == 1 and st.duplicate == 1
    assert st.keys[("r", "a")].content == "v2"
    assert st.keys[("r", "b")].is_deleted and st.keys[("r", "b")].ever_deleted
    assert st.history_rows == 2  # w1 closed by the delete
    # re-insert after delete
    st.apply_epoch([ev("r", "b", "c005", "go", "w2")])
    k = st.keys[("r", "b")]
    assert not k.is_deleted and k.ever_deleted and k.version_count == 2
    sil = st.expected_silver()
    assert set(sil) == {("r", "a"), ("r", "b")}
    gold = st.expected_gold()
    assert gold["r"]["file_count"] == 2 and gold["r"]["deleted_count"] == 1
    assert gold["r"]["latest_commit"] == "c005"


def test_oracle_tombstone_before_insert():
    # delayed delivery can surface a tombstone before its key's insert
    st = OracleState()
    st.apply_epoch([("r", "x", "c009", "", TOMBSTONE)])
    k = st.keys[("r", "x")]
    assert k.is_deleted and k.ever_deleted and k.version_count == 0
    st.apply_epoch([("r", "x", "c005", "py", "old")])  # stale → stays dead
    assert st.keys[("r", "x")].is_deleted and st.stale == 1
    assert ("r", "x") not in st.expected_silver()


def test_replay_files_matches_incremental(tmp_path):
    files = generate_events(str(tmp_path / "ev"), n_events=1000, n_repos=8, n_epochs=4, seed=42)
    st = replay_files(files)
    assert st.applied > 0 and len(st.expected_silver()) > 0
    # every live key's content sha must be reproducible from the generator rule
    sil = st.expected_silver()
    assert all(len(v["content_sha256"]) == 64 for v in sil.values())
