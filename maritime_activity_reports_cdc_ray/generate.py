"""Deterministic synthetic repo-commit change-stream generator (FIXTURES.md §1).

Reference analogue: the seeded AIS CDC simulator at
``bronze/cdc_ingestion.py:226-287`` (N keys x M records, op mix). Ours produces
the mandated input shape ``(repo, path, commit, lang, content)`` with:

- Zipf-skewed repo popularity (mega-repos exist → skew/salting tests),
- ~55% key reuse (reuse ⇒ update or delete of an existing key),
- zero-padded, strictly-increasing ``commit`` (lexicographic order = event order),
- ~5% tombstone deletes (``content == "__TOMBSTONE__" and lang == ""``),
- ~1% exact duplicate delivery and ~2% delayed (out-of-order, pushed into the
  next epoch) delivery to exercise LWW idempotence,
- optional 5%-dirty corruption (FIXTURES.md §2) for validation tests.

One epoch = one Parquet file ``part-{epoch:05d}.parquet``. Fully seeded: same
(seed, sizes) → byte-identical files.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from maritime_activity_reports_cdc_ray.schemas import EVENT_SCHEMA, TOMBSTONE

_EXT_LANG = [
    ("py", "py"),
    ("rs", "rs"),
    ("go", "go"),
    ("js", "js"),
    ("md", "md"),
    ("txt", "txt"),
]


def _content_for(repo: str, path: str, commit: str, median: int) -> str:
    """Deterministic pseudo-source text; length log-normal (median ~`median` B,
    p99 ~41x median); derived from H(repo,path,commit) so sha256(content) is
    reproducible independent of generation order."""
    h = hashlib.sha256(f"{repo}|{path}|{commit}".encode()).hexdigest()
    # length from the row-content hash itself (not the global rng) so delayed /
    # duplicated delivery cannot perturb other rows' content
    u = int(h[:8], 16) / 0xFFFFFFFF
    z = math.sqrt(2.0) * _erfinv(2.0 * min(max(u, 1e-9), 1 - 1e-9) - 1.0)
    length = max(16, int(median * math.exp(1.6 * z)))
    body = (f"// {repo}/{path} @ {commit}\n" + h + "\n") * (length // 72 + 1)
    return body[:length]


def _erfinv(x: float) -> float:
    # Winitzki approximation — plenty for synthetic length shaping
    a = 0.147
    ln1mx2 = math.log(1 - x * x)
    t1 = 2 / (math.pi * a) + ln1mx2 / 2
    return math.copysign(math.sqrt(math.sqrt(t1 * t1 - ln1mx2 / a) - t1), x)


NESTED_TAGS_TYPE = pa.list_(pa.string())
NESTED_META_TYPE = pa.struct([("author", pa.string()), ("stars", pa.int64())])


def nested_payload_for(repo: str, path: str, commit: str, lang) -> tuple:
    """Deterministic (tags, meta) nested payload for one event row — derived
    from H(repo,path,commit) like ``_content_for`` so duplicate/delayed
    delivery reproduces the same values. ~14% null tags, ~9% null meta
    (exercises nullable nested columns end-to-end). Reference analogue: the
    ``ARRAY<STRING>`` silver column at silver/table_setup.py:197."""
    h = hashlib.sha256(f"{repo}|{path}|{commit}|nested".encode()).digest()
    if h[0] % 7 == 0:
        tags = None
    else:
        tags = [lang if lang else "none"] + [f"t{h[i] % 10}" for i in range(1, 1 + h[1] % 3)]
    if h[5] % 11 == 0:
        meta = None
    else:
        meta = {"author": f"dev{h[2] % 50:03d}", "stars": int.from_bytes(h[3:5], "big") % 1000}
    return tags, meta


def generate_events(
    out_dir: str,
    n_events: int = 600,
    n_repos: int = 10,
    n_epochs: int = 1,
    seed: int = 42,
    content_median: int = 400,
    p_reuse: float = 0.55,
    p_delete: float = 0.05,
    p_dup: float = 0.01,
    p_delay: float = 0.02,
    p_lang_change: float = 0.02,
    zipf_s: float = 1.2,
    dirty_fraction: float = 0.0,
    schema_evolve_from_epoch: int | None = None,
    nested_payload_from_epoch: int | None = None,
    row_group_size: int = 16384,
) -> list[str]:
    """Write ``n_epochs`` Parquet files of change events under ``out_dir``.

    ``schema_evolve_from_epoch``: if set, files from that epoch on carry an
    additional ``size_hint`` int64 column (exercises additive schema evolution,
    reference analogue ``mergeSchema=true`` at bronze/cdc_ingestion.py:59).

    ``nested_payload_from_epoch``: if set, files from that epoch on carry a
    ``tags`` list<string> and a ``meta`` struct<author,stars> column (nested
    additive evolution — the reference's silver schema carries ARRAY<STRING>,
    silver/table_setup.py:197). Values are content-hash-deterministic
    (``nested_payload_for``) so the dict oracle can replay them.

    Returns the ordered list of file paths (epoch order).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # Zipf-skewed repo weights
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    w = 1.0 / np.power(ranks, zipf_s)
    w /= w.sum()
    repo_names = [f"org{i // 100:03d}/repo{i % 100:05d}" for i in range(n_repos)]

    seen_paths: list[list[str]] = [[] for _ in range(n_repos)]  # ever-seen per repo
    live: list[set] = [set() for _ in range(n_repos)]  # currently live per repo
    path_lang: dict[tuple[int, str], str] = {}

    per_epoch = max(1, n_events // n_epochs)
    seq = 0
    delayed: list[tuple] = []  # events pushed into the next epoch
    paths_out: list[str] = []

    for epoch in range(n_epochs):
        rows: list[tuple] = []
        rows.extend(delayed)
        delayed = []
        budget = per_epoch if epoch < n_epochs - 1 else n_events - per_epoch * (n_epochs - 1)
        # pre-draw all randomness for the epoch (a per-event rng.choice(p=w)
        # recomputes the cumulative weights every call — ~60us/event)
        cum = np.cumsum(w)
        repo_draw = np.searchsorted(cum, rng.random(budget)).clip(0, n_repos - 1)
        u_reuse = rng.random(budget)
        u_pathpick = rng.random(budget)
        d_depth = rng.integers(0, 5, size=budget)
        d_ext = rng.integers(len(_EXT_LANG), size=budget)
        u_delete = rng.random(budget)
        u_langchg = rng.random(budget)
        d_lang2 = rng.integers(len(_EXT_LANG), size=budget)
        u_delay = rng.random(budget)
        u_dup = rng.random(budget)
        last_epoch = epoch == n_epochs - 1
        for i in range(budget):
            r = int(repo_draw[i])
            repo = repo_names[r]
            reuse = bool(seen_paths[r]) and u_reuse[i] < p_reuse
            if reuse:
                path = seen_paths[r][int(u_pathpick[i] * len(seen_paths[r]))]
            else:
                ext, lang = _EXT_LANG[int(d_ext[i])]
                path = f"src/m{int(d_depth[i])}/f{len(seen_paths[r]):06d}.{ext}"
                seen_paths[r].append(path)
                path_lang[(r, path)] = lang
            commit = f"c{seq:012d}"
            seq += 1
            is_live = path in live[r]
            if reuse and is_live and u_delete[i] < p_delete:
                row = (repo, path, commit, "", TOMBSTONE)
                live[r].discard(path)
            else:
                lang = path_lang[(r, path)]
                if is_live and u_langchg[i] < p_lang_change:
                    lang = _EXT_LANG[int(d_lang2[i])][1]
                    path_lang[(r, path)] = lang
                row = (repo, path, commit, lang, _content_for(repo, path, commit, content_median))
                live[r].add(path)
            # delivery faults (never delay out of the final epoch)
            if not last_epoch and u_delay[i] < p_delay:
                delayed.append(row)
            else:
                rows.append(row)
                if u_dup[i] < p_dup:
                    rows.append(row)

        if dirty_fraction > 0.0 and rows:
            idx = rng.random(len(rows)) < dirty_fraction
            for i in np.flatnonzero(idx):
                repo, path, commit, lang, content = rows[i]
                mode = int(rng.integers(4))
                if mode == 0:
                    rows[i] = ("", path, commit, lang, content)  # hard-invalid key
                elif mode == 1:
                    rows[i] = (repo, "", commit, lang, content)  # hard-invalid key
                elif mode == 2:
                    rows[i] = (repo, path, f"bad{int(rng.integers(10 ** 6))}", lang, content)
                else:
                    rows[i] = (repo, path, commit, None, content * 4)  # soft issues

        # small in-epoch disorder: swap ~2% adjacent-ish pairs (window < 1000)
        n = len(rows)
        if n > 2:
            for i in rng.integers(0, max(1, n - 1), size=max(1, int(0.02 * n))):
                j = min(n - 1, int(i) + int(rng.integers(1, min(1000, n - int(i)))))
                rows[int(i)], rows[j] = rows[j], rows[int(i)]

        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        tbl = pa.table(
            {
                "repo": pa.array(cols[0], pa.string()),
                "path": pa.array(cols[1], pa.string()),
                "commit": pa.array(cols[2], pa.string()),
                "lang": pa.array(cols[3], pa.string()),
                "content": pa.array(cols[4], pa.large_string()),
            }
        )
        if schema_evolve_from_epoch is not None and epoch >= schema_evolve_from_epoch:
            tbl = tbl.append_column(
                "size_hint", pa.array([len(c) if c is not None else 0 for c in cols[4]], pa.int64())
            )
        if nested_payload_from_epoch is not None and epoch >= nested_payload_from_epoch:
            nested = [nested_payload_for(r, p, c, l)
                      for r, p, c, l in zip(cols[0], cols[1], cols[2], cols[3])]
            tbl = tbl.append_column(
                "tags", pa.array([t for t, _ in nested], NESTED_TAGS_TYPE)
            ).append_column(
                "meta", pa.array([m for _, m in nested], NESTED_META_TYPE)
            )
        fp = os.path.join(out_dir, f"part-{epoch:05d}.parquet")
        # small row groups so readers can split one epoch file into parallel
        # blocks (a single-row-group file serializes the whole ingest chain)
        pq.write_table(tbl, fp, compression="zstd", row_group_size=row_group_size)
        paths_out.append(fp)

    assert EVENT_SCHEMA is not None
    return paths_out
