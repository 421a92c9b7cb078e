"""Manifest-based Parquet lake table with an idempotent two-phase-commit sink.

This is our Delta-log substitute (reference: Delta transactional tables +
``enableChangeDataFeed`` TBLPROPERTIES, ``bronze/table_setup.py:38-82``; exactly
-once via checkpoint + transactional commit, ``silver/cdf_processor.py:83-88``).

Layout::

    <root>/
      _manifests/manifest-<version 10d>.json   # atomic rename = commit point
      fragments/epoch=<E>/pid=<pid>/<kind>-<salt>.parquet
      _lineage/epoch-<E>.json                  # per-epoch lineage records

Protocol (north_star two-phase commit):

1. **Stage**: merge tasks write fragments to *deterministic* paths derived from
   ``(epoch, pid, salt, kind)`` via write-temp-then-``os.replace`` — re-running
   an epoch simply overwrites its staged fragments; partially-written files from
   a crash are invisible (never referenced) and get overwritten on rerun.
2. **Commit**: the driver writes ``manifest-<V+1>.json.tmp`` (fsync) and
   atomically renames it. Readers resolve the highest-numbered manifest; a
   fragment exists for a reader only if a committed manifest references it.

Re-committing an already-committed epoch is a no-op (idempotent replay).
``vacuum`` deletes files unreferenced by the latest manifest.

Scale note: the manifest holds one entry per live fragment. With
``num_partitions`` = O(64k) and a handful of fragments per partition
(compaction keeps the chain short) this is a few-MB JSON — same order as a
Delta checkpoint file. Per-epoch lineage lives in side files, not the manifest.
"""

from __future__ import annotations

import base64
import glob
import json
import os
import re
import tempfile
from dataclasses import asdict, dataclass, field

import pyarrow as pa

_MANIFEST_RE = re.compile(r"^manifest-(\d{10})\.json$")

FORMAT_VERSION = 2  # current on-disk format (content-pointer silver)


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the manifest version this transaction
    targeted (optimistic concurrency — the Delta commit-conflict analogue).
    The caller should re-read ``latest_manifest()`` and retry on top of it."""


@dataclass
class Fragment:
    path: str  # relative to table root
    pid: int
    salt: int
    kind: str  # "current" | "history" | "data"
    epoch: int
    rows: int
    bytes: int
    # column names the file actually STORES — readers projecting evolved
    # columns group fragments by this instead of opening every parquet
    # footer on the driver (None on manifests written before the field
    # existed → those fall back to one footer read per fragment)
    cols: list | None = None
    # zone map: {col: [min, max, null_count]} for data skipping (see
    # state.zonemap). None on pre-zonemap manifests = cannot skip.
    zmap: dict | None = None


@dataclass
class Manifest:
    version: int
    epoch: int  # last committed epoch (-1 = fresh table)
    name: str
    num_partitions: int
    schema_b64: str
    fragments: list = field(default_factory=list)  # list[Fragment]
    salt_map: dict = field(default_factory=dict)  # {str(pid): salt} (non-default only)
    stats: dict = field(default_factory=dict)  # cumulative counters
    gold_epoch: int = -1  # unused except on gold tables sharing a root
    # on-disk format version. 1 = silver stored a materialized `content`
    # column; 2 = content-pointer silver (`content_epoch`). Manifests written
    # before the field existed deserialize as 1 (the dataclass default), so
    # new code fails fast with a clear message instead of a missing-column
    # error deep in a read (see CDCReplay.read_silver).
    format_version: int = 1

    @property
    def schema(self) -> pa.Schema:
        return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(self.schema_b64)))

    def to_json(self) -> str:
        d = asdict(self)
        d["fragments"] = [asdict(f) for f in self.fragments]
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        d["fragments"] = [Fragment(**f) for f in d["fragments"]]
        return Manifest(**d)


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def union_schemas(base: pa.Schema, other: pa.Schema) -> pa.Schema:
    """Additive schema evolution: append columns of ``other`` missing from
    ``base`` (reference: ``mergeSchema=true``, bronze/cdc_ingestion.py:59).
    Type changes for existing columns are rejected."""
    fields = list(base)
    names = set(base.names)
    for f in other:
        if f.name in names:
            bf = base.field(f.name)
            if bf.type != f.type and not pa.types.is_null(f.type):
                # permit string/large_string widening only
                ok = {bf.type, f.type} <= {pa.string(), pa.large_string()}
                if not ok:
                    raise ValueError(f"schema evolution type conflict on {f.name}: {bf.type} vs {f.type}")
        else:
            fields.append(f)
            names.add(f.name)
    return pa.schema(fields)


class LakeTable:
    """One logical table = a directory of Parquet fragments + a manifest chain."""

    def __init__(self, root: str):
        self.root = root

    # ------------------------------------------------------------- create/load
    @staticmethod
    def create(root: str, name: str, schema: pa.Schema, num_partitions: int) -> "LakeTable":
        t = LakeTable(root)
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "fragments"), exist_ok=True)
        os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)
        if t.latest_manifest() is None:
            m = Manifest(
                version=0,
                epoch=-1,
                name=name,
                num_partitions=num_partitions,
                schema_b64=schema_to_b64(schema),
                format_version=FORMAT_VERSION,
            )
            t._write_manifest(m)
        return t

    def latest_manifest(self) -> Manifest | None:
        mdir = os.path.join(self.root, "_manifests")
        if not os.path.isdir(mdir):
            return None
        best = None
        for fn in os.listdir(mdir):
            mm = _MANIFEST_RE.match(fn)
            if mm:
                v = int(mm.group(1))
                if best is None or v > best[0]:
                    best = (v, fn)
        if best is None:
            return None
        with open(os.path.join(mdir, best[1])) as f:
            return Manifest.from_json(f.read())

    def manifest_as_of(self, epoch: int) -> Manifest:
        """Epoch-pinned time travel (reference analogue: Delta ``VERSION AS
        OF`` / CDF ``startingVersion``, silver/cdf_processor.py:41).

        Resolution rule: prefer the highest-VERSION manifest whose epoch
        watermark EQUALS ``epoch`` (later maintenance rewrites of the same
        watermark win — their fragment set is the one that survives
        compaction); only when no manifest committed that exact epoch, fall
        back to the highest-version manifest with epoch <= ``epoch``. The
        exact-match preference matters once :meth:`restore` makes the
        watermark non-monotonic across versions: after ``restore(1)`` on a
        3-epoch table, ``as_of(2)`` must still resolve to the (undeleted)
        epoch-2 manifest, not the higher-version restore manifest whose
        watermark is 1. Available until ``vacuum()`` prunes superseded
        manifests/fragments — the same retention contract as Delta."""
        mdir = os.path.join(self.root, "_manifests")
        versions = sorted(
            (int(m.group(1)) for m in map(_MANIFEST_RE.match, os.listdir(mdir)) if m),
            reverse=True)
        fallback = None
        for v in versions:  # high → low: first hit of each rule is the latest
            with open(os.path.join(mdir, f"manifest-{v:010d}.json")) as f:
                m = Manifest.from_json(f.read())
            if m.epoch == epoch:
                return m
            if fallback is None and m.epoch < epoch:
                fallback = m  # keep scanning — an exact match at a lower
                # version (shadowed by a restore) still wins
        if fallback is not None:
            return fallback
        raise LookupError(
            f"no manifest with epoch <= {epoch} in {self.root} "
            "(epoch predates table creation, or vacuum() pruned history)")

    # ----------------------------------------------------------------- staging
    def fragment_relpath(self, epoch: int, pid: int, salt: int, kind: str, suffix: str = "") -> str:
        sfx = f"-{suffix}" if suffix else ""
        return f"fragments/epoch={epoch}/pid={pid:06d}/{kind}-{salt:03d}{sfx}.parquet"

    def abspath(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def stage_fragment(self, table: pa.Table, epoch: int, pid: int, salt: int, kind: str,
                       compression: str = "zstd", suffix: str = "",
                       row_group_size: int | None = None) -> Fragment:
        """Write a fragment to its deterministic path (temp + atomic replace).
        Safe to call from any Ray task/actor; reruns overwrite.
        ``row_group_size`` caps rows per parquet row group — smaller groups
        give predicate reads finer statistics-based skipping granularity on
        clustered fragments (see pipelines.maintenance.compact_table)."""
        import pyarrow.parquet as pq

        rel = self.fragment_relpath(epoch, pid, salt, kind, suffix)
        dst = self.abspath(rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst), suffix=".tmp")
        os.close(fd)
        try:
            kw = {"row_group_size": row_group_size} if row_group_size else {}
            pq.write_table(table, tmp, compression=compression, **kw)
            os.replace(tmp, dst)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        from maritime_activity_reports_cdc_ray.state.zonemap import zmap_of_table

        return Fragment(
            path=rel, pid=pid, salt=salt, kind=kind, epoch=epoch,
            rows=table.num_rows, bytes=os.path.getsize(dst),
            cols=list(table.column_names),
            zmap=zmap_of_table(table),
        )

    # ------------------------------------------------------------------ commit
    def commit_epoch(
        self,
        epoch: int,
        new_fragments: list,
        replaced: "set[str] | None" = None,
        schema: pa.Schema | None = None,
        lineage: list | None = None,
        salt_map: dict | None = None,
        stats_delta: dict | None = None,
    ) -> Manifest:
        """Atomically publish epoch ``epoch``.

        ``replaced``: relpaths of fragments superseded by this epoch (e.g. the
        previous 'current' fragment of each touched (pid, salt)). Idempotent:
        committing an epoch <= the manifest's epoch is a no-op.

        Concurrency (the Delta OCC model): losing the manifest-version race
        raises :class:`ConcurrentCommitError` from the put-if-absent write.
        APPEND-only commits (no ``replaced`` set) auto-REBASE: the
        transaction is rebuilt on the new latest manifest and retried,
        because disjoint fragment additions commute — this covers pipelined
        commits racing in epoch order (k+1's commit overlapping k's retry).
        Replace-commits (merges) propagate the error — their fragments were
        computed AGAINST a specific base state, so the caller must re-merge,
        not blind-rebase. NOTE the epoch watermark stays the stream
        contract: an append whose epoch is <= the (possibly just-advanced)
        watermark is treated as already replayed and no-ops; writers wanting
        epoch-unordered additions use :meth:`commit_maintenance`.
        """
        m0 = self.latest_manifest()
        assert m0 is not None, "table not created"
        if epoch <= m0.epoch:
            # idempotency check BEFORE the lineage write: a stale replay of
            # an already-committed epoch must not publish phantom lineage
            # rows for fragments that never land.
            return m0
        if lineage is not None:
            lp = os.path.join(self.root, "_lineage", f"epoch-{epoch}.json")
            with open(lp + ".tmp", "w") as f:
                json.dump(lineage, f)
            os.replace(lp + ".tmp", lp)
        for _attempt in range(64):  # bound only against pathological races
            m = self.latest_manifest()
            if epoch <= m.epoch:
                return m  # already committed — exactly-once replay
            keep = [f for f in m.fragments if not (replaced and f.path in replaced)]
            m2 = Manifest(
                version=m.version + 1,
                epoch=epoch,
                name=m.name,
                num_partitions=m.num_partitions,
                schema_b64=schema_to_b64(schema) if schema is not None else m.schema_b64,
                fragments=keep + list(new_fragments),
                salt_map=dict(salt_map) if salt_map is not None else m.salt_map,
                stats=_merge_stats(m.stats, stats_delta),
                format_version=m.format_version,
            )
            try:
                self._write_manifest(m2)
                return m2
            except ConcurrentCommitError:
                if replaced:
                    raise  # merge commits must re-merge against the new state
        raise ConcurrentCommitError(
            f"append commit of epoch {epoch} lost 64 consecutive version races")

    def clone_to(self, dst_root: str, epoch: int | None = None) -> "LakeTable":
        """Delta SHALLOW CLONE analogue: publish a NEW table at ``dst_root``
        whose manifest references the SOURCE table's fragment files — zero
        data copied, O(manifest) work regardless of table size. Fragment
        paths are rewritten relative to the clone's root (``../``-style), so
        every read path works unchanged. The clone then lives its own life:
        new epochs append under its own root, and ``vacuum()`` on the clone
        only walks the clone's own ``fragments/`` dir, so it can never
        delete source data. The one shared-fate hazard is Delta's own:
        vacuuming the SOURCE can remove files a shallow clone still
        references — retention is the source's contract, exactly as with
        ``CLONE ... SHALLOW``.

        ``epoch``: clone the table AS OF that epoch (manifest_as_of rules)
        instead of the latest state. Lineage JSONs (tiny, driver-side) are
        copied so incremental consumers (gold refresh catch-up) keep
        working."""
        import dataclasses
        import shutil as _sh

        src_m = (self.latest_manifest() if epoch is None
                 else self.manifest_as_of(epoch))
        assert src_m is not None, "source table not created"
        t = LakeTable(dst_root)
        assert t.latest_manifest() is None, f"{dst_root} already has a table"
        os.makedirs(os.path.join(dst_root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(dst_root, "fragments"), exist_ok=True)
        os.makedirs(os.path.join(dst_root, "_lineage"), exist_ok=True)
        frags = [dataclasses.replace(
            f, path=os.path.relpath(self.abspath(f.path), dst_root))
            for f in src_m.fragments]
        m = Manifest(
            version=0,
            epoch=src_m.epoch,
            name=src_m.name,
            num_partitions=src_m.num_partitions,
            schema_b64=src_m.schema_b64,
            fragments=frags,
            salt_map=dict(src_m.salt_map),
            stats=dict(src_m.stats),
            gold_epoch=src_m.gold_epoch,
            format_version=src_m.format_version,
        )
        t._write_manifest(m)
        src_lin = os.path.join(self.root, "_lineage")
        if os.path.isdir(src_lin):
            for fn in os.listdir(src_lin):
                if fn.endswith(".json"):
                    ep = fn.removeprefix("epoch-").removesuffix(".json")
                    if epoch is not None and ep.isdigit() and int(ep) > epoch:
                        continue  # lineage newer than the pin stays behind
                    _sh.copy(os.path.join(src_lin, fn),
                             os.path.join(dst_root, "_lineage", fn))
        return t

    def restore(self, epoch: int) -> Manifest:
        """Delta ``RESTORE TABLE ... TO VERSION AS OF`` analogue: publish a
        NEW manifest whose content (fragment set, schema, salt map, stats,
        epoch watermark) equals the table state as of ``epoch``. Nothing is
        deleted — the restore is itself one more version in the chain, so it
        is time-travelable and crash-atomic (one manifest rename); fragments
        introduced by the rolled-back epochs simply become unreferenced and
        fall to ``vacuum()``. After a silver restore, re-running the replay
        re-applies epochs > ``epoch`` from committed bronze (the durable
        log is never rolled back) — the reprocess-bad-data workflow."""
        m = self.latest_manifest()
        assert m is not None, "table not created"
        src = self.manifest_as_of(epoch)
        if src.version == m.version:
            return m  # already at that state — idempotent
        m2 = Manifest(
            version=m.version + 1,
            epoch=src.epoch,
            name=m.name,
            num_partitions=src.num_partitions,
            schema_b64=src.schema_b64,
            fragments=list(src.fragments),
            salt_map=dict(src.salt_map),
            stats=dict(src.stats),
            format_version=src.format_version,
        )
        self._write_manifest(m2)
        return m2

    def commit_maintenance(
        self,
        new_fragments: list,
        replaced: set,
        salt_map: dict | None = None,
    ) -> Manifest:
        """Publish a maintenance rewrite (resalt / compaction) — bumps the
        manifest version without advancing the epoch watermark (reference
        analogue: OPTIMIZE/compaction commits, utils/spark_utils.py:153-176)."""
        m = self.latest_manifest()
        assert m is not None
        keep = [f for f in m.fragments if f.path not in replaced]
        m2 = Manifest(
            version=m.version + 1,
            epoch=m.epoch,
            name=m.name,
            num_partitions=m.num_partitions,
            schema_b64=m.schema_b64,
            fragments=keep + list(new_fragments),
            salt_map=dict(salt_map) if salt_map is not None else m.salt_map,
            stats=m.stats,
            format_version=m.format_version,
        )
        self._write_manifest(m2)
        return m2

    def overwrite(self, data, schema: pa.Schema | None = None,
                  compression: str = "zstd") -> Manifest:
        """Full refresh (S4): atomically replace the table's entire contents —
        the reference-data path (``mode("overwrite")`` +
        ``overwriteSchema=true``, ``bronze/cdc_ingestion.py:121-127``).

        ``data`` is a Ray Dataset (streamed fragment-per-block, the scale
        path) or a ``pyarrow.Table`` (small dims). Fragments are staged under
        a version-scoped directory, then ONE manifest swap publishes them and
        drops every previous fragment — readers see the old or the new table,
        never a mix; ``vacuum()`` reclaims the old files. The epoch watermark
        is preserved (a reference refresh is not a CDC epoch)."""
        import pyarrow.parquet as pq

        m = self.latest_manifest()
        assert m is not None, "table not created"
        ver = m.version + 1
        outdir = self.abspath(f"fragments/refresh-{ver:010d}")
        os.makedirs(outdir, exist_ok=True)
        if isinstance(data, pa.Table):
            dst = os.path.join(outdir, "part-000000.parquet")
            pq.write_table(data, dst + ".tmp", compression=compression)
            os.replace(dst + ".tmp", dst)
            new_schema = schema or data.schema
        else:
            data.write_parquet(outdir, compression=compression)
            new_schema = schema  # resolved from the written files below
        from maritime_activity_reports_cdc_ray.state.zonemap import zmap_from_footer

        frags = []
        for fp in sorted(glob.glob(os.path.join(outdir, "*.parquet"))):
            if new_schema is None:
                new_schema = pq.read_schema(fp)
            md = pq.read_metadata(fp)
            frags.append(Fragment(
                path=os.path.relpath(fp, self.root), pid=-1, salt=0,
                kind="data", epoch=m.epoch, rows=md.num_rows,
                bytes=os.path.getsize(fp),
                cols=list(new_schema.names),
                zmap=zmap_from_footer(md, new_schema)))
        if new_schema is None:  # empty refresh keeps the old schema
            new_schema = m.schema
        m2 = Manifest(
            version=ver,
            epoch=m.epoch,
            name=m.name,
            num_partitions=m.num_partitions,
            schema_b64=schema_to_b64(new_schema),
            fragments=frags,
            salt_map={},
            stats=_merge_stats(m.stats, {"overwrites": 1}),
            format_version=m.format_version,
        )
        self._write_manifest(m2)
        return m2

    def _write_manifest(self, m: Manifest) -> None:
        """Commit = PUT-IF-ABSENT of the next manifest version (reference:
        Delta's optimistic concurrency — a transaction loses if its target
        version already exists, utils/spark_utils.py commit path). A plain
        rename would silently REPLACE a concurrent committer's manifest
        (lost update); ``os.link`` is atomic and fails on an existing
        target. A byte-identical existing manifest is accepted (idempotent
        retry of the same commit); different bytes raise
        :class:`ConcurrentCommitError` so the loser re-reads and retries
        against the new latest version instead of corrupting the chain."""
        mdir = os.path.join(self.root, "_manifests")
        os.makedirs(mdir, exist_ok=True)
        dst = os.path.join(mdir, f"manifest-{m.version:010d}.json")
        tmp = dst + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(m.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, dst)  # atomic put-if-absent
        except FileExistsError:
            with open(dst) as f:
                existing = f.read()
            if existing != m.to_json():
                os.unlink(tmp)
                raise ConcurrentCommitError(
                    f"manifest version {m.version} of table '{m.name}' was "
                    f"committed by another writer; re-read latest_manifest() "
                    f"and retry the commit against it") from None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # ----------------------------------------------------------------- readers
    def fragments_for_pid(self, m: Manifest, pid: int, kind: str = "current") -> list:
        return [f for f in m.fragments if f.pid == pid and f.kind == kind]

    def all_fragment_paths(self, m: Manifest, kind: str | None = None) -> list[str]:
        return [self.abspath(f.path) for f in m.fragments if kind is None or f.kind == kind]

    # ------------------------------------------------------------------ vacuum
    def describe_history(self) -> list[dict]:
        """Delta ``DESCRIBE HISTORY`` analogue (reference:
        ``utils/spark_utils.py:128``): one row per manifest version, newest
        first — version, epoch watermark, fragment/row/byte totals, the
        cumulative stats snapshot, and the operation kind inferred from the
        version-to-version diff (append / merge / restore / maintenance).
        Metadata-only: reads manifests, opens no data files."""
        mdir = os.path.join(self.root, "_manifests")
        versions = sorted(
            (int(m.group(1)) for m in map(_MANIFEST_RE.match, os.listdir(mdir)) if m))
        out = []
        prev: Manifest | None = None
        for v in versions:
            with open(os.path.join(mdir, f"manifest-{v:010d}.json")) as f:
                m = Manifest.from_json(f.read())
            paths = {fr.path for fr in m.fragments}
            if prev is None:
                # create/clone inference only holds for version 0; after a
                # vacuum truncates older manifests the oldest SURVIVOR has
                # prev=None but was not the table's origin.
                if m.version == 0:
                    op = "create" if not paths else "clone"
                else:
                    op = "unknown"
            else:
                pp = {fr.path for fr in prev.fragments}
                added, removed = paths - pp, pp - paths
                if m.epoch < prev.epoch:
                    op = "restore"
                elif m.epoch == prev.epoch:
                    op = "maintenance" if (added or removed) else "noop"
                else:
                    op = "merge" if removed else "append"
            out.append({
                "version": m.version, "epoch": m.epoch, "operation": op,
                "fragments": len(m.fragments),
                "rows": sum(fr.rows for fr in m.fragments),
                "bytes": sum(fr.bytes for fr in m.fragments),
                "stats": dict(m.stats),
            })
            prev = m
        return out[::-1]

    def vacuum(self) -> int:
        """Delete fragment files unreferenced by the latest manifest and
        manifests older than the latest (reference: VACUUM,
        utils/spark_utils.py:178-205). Returns files removed."""
        m = self.latest_manifest()
        assert m is not None
        live = {f.path for f in m.fragments}
        removed = 0
        froot = os.path.join(self.root, "fragments")
        for dirpath, _dirs, files in os.walk(froot, topdown=False):
            for fn in files:
                ap = os.path.join(dirpath, fn)
                rel = os.path.relpath(ap, self.root)
                if rel not in live:
                    os.unlink(ap)
                    removed += 1
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
        mdir = os.path.join(self.root, "_manifests")
        for fn in os.listdir(mdir):
            mm = _MANIFEST_RE.match(fn)
            if mm and int(mm.group(1)) < m.version:
                os.unlink(os.path.join(mdir, fn))
                removed += 1
        return removed


def _merge_stats(base: dict, delta: dict | None) -> dict:
    """Cumulative counters sum; ``max_``-prefixed keys merge by max (the
    event-time watermark contract: monotone across epochs and retries)."""
    if not delta:
        return dict(base)
    out = dict(base)
    for k, v in delta.items():
        if k.startswith("max_"):
            out[k] = v if k not in out else max(out[k], v)
        else:
            out[k] = out.get(k, 0) + v
    return out
