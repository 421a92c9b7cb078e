"""Pure-Python dict-replay oracle (FIXTURES.md §3-§4).

This is the executable specification of the engine's CDC semantics — the tests
compare the Ray pipeline's final silver/gold state against this replay.

Semantics (shared, verbatim, with stages/merge.py — keep the two in sync):

- Events are processed in **checkpoint epochs** (one input file = one epoch),
  matching the reference's micro-batch model (silver/cdf_processor.py:44-81).
- Within an epoch, events are sorted by ``(commit, sequence)`` — the reference
  re-establishes per-key order with orderBy windows rather than relying on
  arrival order (SURVEY.md §2.8).
- Per key ``(repo, path)``, an event **applies** iff its ``commit`` is strictly
  greater than the key's last applied commit (LWW; equal commit ⇒ duplicate
  delivery ⇒ idempotent skip — reference analogue: idempotent MERGE,
  silver/cdf_processor.py:259-268). A stale event (lower commit, e.g. delayed
  delivery from an earlier epoch) is skipped.
- An applied non-tombstone creates a new SCD2 version (``version_count += 1``)
  and closes the previous open version if any; an applied tombstone closes the
  open version without creating one (reference: SCD2 merge branches,
  bronze/cdc_ingestion.py:176-217). A tombstone for a never-seen key creates a
  deleted placeholder (version_count 0) so a later stale insert stays dead.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from maritime_activity_reports_cdc_ray.schemas import TOMBSTONE


@dataclass
class KeyState:
    commit: str = ""
    lang: str | None = None
    content: str | None = None
    is_deleted: bool = True
    ever_deleted: bool = False
    version_count: int = 0
    valid_from: str = ""
    # evolved payload columns (scalar OR nested list/struct values) of the
    # winning event; None per-column for tombstones and pre-evolution events
    extra: dict | None = None


@dataclass
class OracleState:
    keys: dict = field(default_factory=dict)  # (repo, path) -> KeyState
    history_rows: int = 0
    applied: int = 0
    stale: int = 0
    duplicate: int = 0
    unchanged: int = 0
    # G3 no-op suppression (reference silver/cdf_processor.py:296-300): skip
    # an applicable event whose watched state equals the key's running state —
    # commit watermark included stays untouched. Mirrors EngineConfig.
    detect_changes: bool = False

    def apply_epoch(self, rows: list[tuple], extras: list[dict | None] | None = None) -> None:
        """rows: (repo, path, commit, lang, content) — one epoch's events.
        ``extras``: optional parallel list of evolved-payload dicts (one per
        row; values may be nested lists/structs) carried onto the winning
        silver row exactly like stages/merge.py's ``extra_fields`` path."""
        if extras is None:
            extras = [None] * len(rows)
        order = sorted(range(len(rows)), key=lambda i: rows[i][2])
        for i in order:
            repo, path, commit, lang, content = rows[i]
            ex = extras[i]
            k = (repo, path)
            st = self.keys.get(k)
            if st is not None:
                if commit == st.commit:
                    self.duplicate += 1
                    continue
                if commit < st.commit:
                    self.stale += 1
                    continue
            is_tomb = content == TOMBSTONE and (lang == "" or lang is None)
            if self.detect_changes:
                noop = ((st is None or st.is_deleted) if is_tomb else
                        (st is not None and not st.is_deleted
                         and st.lang == lang and st.content == content))
                if noop:
                    self.unchanged += 1
                    continue
            if st is None:
                st = self.keys[k] = KeyState()
            self.applied += 1
            if is_tomb:
                if not st.is_deleted:
                    self.history_rows += 1  # close the open version
                st.is_deleted = True
                st.ever_deleted = True
                st.lang = None
                st.content = None
                st.extra = None  # merge kernel nulls extras on tombstones
            else:
                if not st.is_deleted:
                    self.history_rows += 1  # close the previous open version
                st.is_deleted = False
                st.lang = lang
                st.content = content
                st.version_count += 1
                st.valid_from = commit
                st.extra = ex
            st.commit = commit

    # ------------------------------------------------------------------
    def expected_silver(self) -> dict:
        """(repo, path) -> dict for live keys only (FIXTURES.md §3)."""
        out = {}
        for (repo, path), st in self.keys.items():
            if st.is_deleted:
                continue
            out[(repo, path)] = {
                "commit": st.commit,
                "lang": st.lang,
                "content_sha256": hashlib.sha256(st.content.encode("utf-8", "surrogatepass")).hexdigest(),
                "version_count": st.version_count,
                "extra": st.extra,
            }
        return out

    def expected_gold(self) -> dict:
        """repo -> aggregate dict (FIXTURES.md §4)."""
        agg: dict = {}
        for (repo, path), st in self.keys.items():
            a = agg.setdefault(
                repo,
                {
                    "file_count": 0,
                    "latest_commit": "",
                    "total_bytes": 0,
                    "lang_counts": {},
                    "deleted_count": 0,
                    "total_versions": 0,
                    "_pairs": [],
                },
            )
            a["total_versions"] += st.version_count
            if st.ever_deleted:
                a["deleted_count"] += 1
            if st.is_deleted:
                continue
            a["file_count"] += 1
            a["latest_commit"] = max(a["latest_commit"], st.commit)
            a["total_bytes"] += len(st.content)
            a["lang_counts"][st.lang] = a["lang_counts"].get(st.lang, 0) + 1
            sha = hashlib.sha256(st.content.encode("utf-8", "surrogatepass")).hexdigest()
            a["_pairs"].append((path, sha))
        for repo, a in agg.items():
            h = hashlib.sha256()
            for path, sha in sorted(a["_pairs"]):
                h.update(path.encode())
                h.update(b"\x00")
                h.update(sha.encode())
                h.update(b"\n")
            a["repo_sha256"] = h.hexdigest()
            a["lang_counts"] = sorted(a["lang_counts"].items())
            del a["_pairs"]
        return agg


def replay_files(files: list[str]) -> OracleState:
    """Replay event Parquet files in epoch (file) order. Evolved payload
    columns (anything beyond the 5 base event columns — scalars or nested
    list/struct) are carried onto the winning row, None-backfilled for files
    that predate the evolution."""
    base = ["repo", "path", "commit", "lang", "content"]
    # engine-consumed stream metadata, never silver payload (mirror of
    # stages/merge.py _EVENT_META_COLS for the columns a FEED file may carry:
    # DML feeds ship an explicit event_time on watermark lakes)
    meta = {"event_time"}
    st = OracleState()
    for fp in files:
        t = pq.read_table(fp)
        extra_names = [c for c in t.column_names if c not in base and c not in meta]
        rows = list(zip(*(t.column(c).to_pylist() for c in base)))
        extras = None
        if extra_names:
            cols = {c: t.column(c).to_pylist() for c in extra_names}
            extras = [{c: cols[c][i] for c in extra_names} for i in range(t.num_rows)]
        st.apply_epoch(rows, extras)
    return st
