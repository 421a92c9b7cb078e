"""CLI — mirrors the reference's typer verbs (``cli.py:25-299``: setup-tables,
ingest-cdc, start-streaming, optimize-tables, vacuum-tables, health-check,
simulate-data) as argparse subcommands over the Ray-Data engine.

Usage: ``python -m maritime_activity_reports_cdc_ray.cli <verb> ...``
This is an entry point, so it owns the Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False


def _post_filter(ds, pred):
    """Apply a (col, op, value) predicate to tables whose readers take no
    pushdown (changes/quarantine) — a vectorized Arrow filter per batch, so
    ``--where`` is honored on every ``read --table`` branch instead of being
    silently dropped."""
    if pred is None:
        return ds
    col, op, val = pred

    def f(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        c = t.column(col)
        if op == "in":
            mask = pc.is_in(c, value_set=pa.array(val).cast(c.type))
        else:
            mask = pc.equal(c, pa.scalar(val).cast(c.type))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(f, batch_format="pyarrow")


def _replay(args):
    from maritime_activity_reports_cdc_ray.config import EngineConfig
    from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

    nparts = args.partitions
    if nparts is None:
        # adopt the EXISTING lake's partition count (pid assignment derives
        # from it — a mismatching default would fail run()'s guard); only a
        # fresh `setup` needs the knob, defaulting to 32. Go through
        # LakeTable.latest_manifest() — a raw listdir sort can pick up a
        # crashed writer's 'manifest-N.json.tmp-<pid>' leftover.
        import os as _os

        from maritime_activity_reports_cdc_ray.state.table import LakeTable

        sroot = _os.path.join(args.root, "silver")
        m = (LakeTable(sroot).latest_manifest()
             if _os.path.isdir(_os.path.join(sroot, "_manifests")) else None)
        nparts = m.num_partitions if m is not None else 32
    cfg = EngineConfig(num_partitions=nparts)
    if getattr(args, "salt", None):
        cfg.default_salt = args.salt
    return CDCReplay(args.root, cfg)


def main(argv=None):
    p = argparse.ArgumentParser(prog="maritime_activity_reports_cdc_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--root", required=True, help="lake root directory")
        sp.add_argument("--partitions", type=int, default=None,
                        help="partition count — defaults to the lake's own "
                             "manifest value when the lake exists, else 32")
        sp.add_argument("--salt", type=int, default=1)

    sp = sub.add_parser("setup", help="create bronze/silver/gold tables (DDL analogue)")
    common(sp)

    sp = sub.add_parser("replay", help="replay change-stream epochs (ingest+merge+gold)")
    common(sp)
    sp.add_argument("--input", required=True)
    sp.add_argument("--files-per-epoch", type=int, default=1)
    sp.add_argument("--max-epochs", type=int, default=None)

    sp = sub.add_parser("ingest", help="run the next single epoch only")
    common(sp)
    sp.add_argument("--input", required=True)
    sp.add_argument("--files-per-epoch", type=int, default=1)

    sp = sub.add_parser("supervise",
                        help="monitor loop: poll the source dir, replay "
                             "pending epochs, auto-restart a failed run "
                             "(reference monitor_streaming_queries + "
                             "restart_failed_queries)")
    common(sp)
    sp.add_argument("--input", required=True)
    sp.add_argument("--files-per-epoch", type=int, default=1)
    sp.add_argument("--poll-interval", type=float, default=1.0)
    sp.add_argument("--max-polls", type=int, default=None,
                    help="stop after N monitor ticks (default: run until idle)")
    sp.add_argument("--max-restarts", type=int, default=3)

    sp = sub.add_parser("compact", help="compact fragment chains (OPTIMIZE analogue)")
    common(sp)
    sp.add_argument("--table", choices=["silver", "gold"], default="silver")
    sp.add_argument("--cluster-by", default=None,
                    help="comma-separated columns to sort compacted fragments by "
                         "(ZORDER BY analogue: makes row-group stats selective "
                         "for later `read --where` predicates)")
    sp.add_argument("--row-group-size", type=int, default=None,
                    help="rows per parquet row group in compacted fragments "
                         "(smaller = finer predicate skipping)")
    sp.add_argument("--include-single", action="store_true",
                    help="also rewrite single-fragment chains (re-cluster an "
                         "already-compacted table)")
    sp.add_argument("--zorder", action="store_true",
                    help="Morton-interleave the cluster columns (true ZORDER: "
                         "row groups turn selective for predicates on ANY of "
                         "them, not just the first) — needs >= 2 --cluster-by "
                         "columns")
    sp.add_argument("--target-fragment-rows", type=int, default=None,
                    help="split clustered output at range boundaries into "
                         "fragments of at most this many rows, so manifest "
                         "zone maps skip whole files for range predicates. "
                         "Applies to history/gold only (current fragments "
                         "stay whole — the merge needs one per (pid, salt))")

    sp = sub.add_parser("vacuum", help="delete unreferenced fragment files")
    common(sp)

    sp = sub.add_parser("remat", help="bronze retention: consolidate referenced "
                                      "payloads, drop old bronze epochs")
    common(sp)
    sp.add_argument("--retain-epochs", type=int, default=8)

    sp = sub.add_parser("metrics", help="per-epoch stream progress (lastProgress analogue)")
    common(sp)
    sp.add_argument("--history", action="store_true", help="all epochs, not just the last")

    sp = sub.add_parser("health", help="lake health summary")
    common(sp)

    sp = sub.add_parser("analyze", help="ANALYZE TABLE analogue: table-level column "
                        "min/max/null statistics folded from the manifest's "
                        "fragment zone maps (no data files opened)")
    common(sp)
    sp.add_argument("--table", choices=["silver", "gold", "history"],
                    default="silver")

    sp = sub.add_parser("verify", help="verify final state against the dict-replay oracle")
    common(sp)
    sp.add_argument("--input", required=True)

    sp = sub.add_parser("read", help="read silver/gold/history — optionally AS OF an epoch "
                                     "(time travel; Delta VERSION AS OF analogue)")
    common(sp)
    sp.add_argument("--table", choices=["silver", "gold", "history", "quarantine",
                                        "changes"],
                    default="silver")
    sp.add_argument("--as-of-epoch", type=int, default=None)
    sp.add_argument("--from-epoch", type=int, default=None,
                    help="changes only: feed covers (from-epoch, as-of-epoch] "
                         "(Delta table_changes analogue; omit = table start)")
    sp.add_argument("--columns", default=None, help="comma-separated projection")
    sp.add_argument("--where", default=None, metavar="COL=VALUE",
                    help="pushed-down equality filter (comma-separated values "
                         "= IN list); COL=repo prunes to the key's hash "
                         "partition before opening any file")
    sp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser("restore", help="roll silver+gold back to their state as of an "
                                        "epoch (Delta RESTORE analogue; bronze is never "
                                        "rolled back — a later `replay` re-applies and "
                                        "reconverges)")
    common(sp)
    sp.add_argument("--epoch", type=int, required=True)

    sp = sub.add_parser("history", help="DESCRIBE HISTORY analogue: one row per "
                                        "manifest version (newest first) with the "
                                        "inferred operation — metadata-only")
    common(sp)
    sp.add_argument("--table", default="silver",
                    choices=["bronze", "silver", "gold"])
    sp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser("clone", help="SHALLOW CLONE the lake (bronze+silver+gold"
                                      "[+cache]) to another root — zero data copied, "
                                      "manifests reference the source's files; "
                                      "optionally AS OF an epoch (dev/test branch "
                                      "workflow, Delta CLONE analogue)")
    common(sp)
    sp.add_argument("--dst", required=True, help="destination lake root")
    sp.add_argument("--as-of-epoch", type=int, default=None)

    sp = sub.add_parser("view", help="incrementally maintain a group-by view from "
                                     "the CDF (IVM): refresh applies only the net "
                                     "change feed since the view's watermark, then "
                                     "prints the state")
    common(sp)
    sp.add_argument("--name", required=True)
    sp.add_argument("--group-cols", required=True,
                    help="comma-separated group columns (e.g. lang)")
    sp.add_argument("--sum-cols", default="",
                    help="comma-separated int columns to SUM (COUNT is implicit)")
    sp.add_argument("--limit", type=int, default=50)

    sp = sub.add_parser("gold", help="drive gold as its OWN checkpointed "
                                     "CDF consumer (reference: the silver→"
                                     "gold StreamingQuery): status, one-"
                                     "epoch step, or catch-up refresh — "
                                     "pair with a replay run under "
                                     "gold_refresh_every_epochs=0 to fully "
                                     "decouple the two streams")
    common(sp)
    sp.add_argument("--status", action="store_true",
                    help="print watermark/lag only, no refresh")
    sp.add_argument("--step", action="store_true",
                    help="consume exactly one silver epoch (pinned "
                         "time-travel read) instead of catching up")
    sp.add_argument("--to-epoch", type=int, default=None,
                    help="refresh to this silver epoch (default: latest)")

    sp = sub.add_parser("delete", help="DELETE FROM silver WHERE ... as a "
                                       "deletion feed: writes one tombstone "
                                       "event per matching live key to a "
                                       "stream part file; drop it into the "
                                       "input dir and `replay` applies it "
                                       "exactly-once (deletes surface in "
                                       "history, CDF, gold and views)")
    common(sp)
    sp.add_argument("--where", required=True, help="col=value[,value...]")
    sp.add_argument("--out", required=True,
                    help="output parquet path (name it to sort as the next "
                         "epoch, e.g. part-00007.parquet)")

    sp = sub.add_parser("update", help="UPDATE ... SET as an update feed "
                                       "(make_tombstones' companion): one "
                                       "upsert event per matching live key "
                                       "with the given column overridden; "
                                       "`replay` applies it exactly-once")
    common(sp)
    sp.add_argument("--where", required=True, help="col=value[,value...]")
    sp.add_argument("--set", required=True, dest="set_expr",
                    help="col=value (lang or content)")
    sp.add_argument("--out", required=True)

    sp = sub.add_parser("export", help="export a consistent table snapshot "
                                       "(optionally AS OF an epoch) to hive-"
                                       "partitioned parquet via the resumable "
                                       "sink — the GCS/BigQuery export analogue; "
                                       "reruns skip finished partitions")
    common(sp)
    sp.add_argument("--table", default="silver",
                    choices=["silver", "gold", "history"])
    sp.add_argument("--dest", required=True)
    sp.add_argument("--partition-by", default="lang")
    sp.add_argument("--columns", default=None)
    sp.add_argument("--as-of-epoch", type=int, default=None)

    sp = sub.add_parser("stream-window", help="append-mode windowed streaming "
                                              "aggregation: consume new bronze epochs, "
                                              "emit windows finalized by the watermark "
                                              "(--flush finalizes the rest at stream end)")
    common(sp)
    sp.add_argument("--name", required=True)
    sp.add_argument("--window-size", type=int, required=True)
    sp.add_argument("--group-cols", default="lang")
    sp.add_argument("--sum-cols", default="")
    sp.add_argument("--flush", action="store_true")
    sp.add_argument("--limit", type=int, default=50)

    sp = sub.add_parser("curate", help="run the end-to-end corpus curation pipeline "
                        "over a documents parquet and write the kept docs as "
                        "resumable lang-partitioned parquet")
    sp.add_argument("--input", required=True, help="parquet file/dir with (doc_id, text)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--no-c4", action="store_true",
                    help="skip the boilerplate line filter (single-line corpora)")
    sp.add_argument("--min-quality", type=float, default=0.6)
    sp.add_argument("--lm-low", type=float, default=5.0)
    sp.add_argument("--lm-high", type=float, default=20.0,
                    help="drop docs above this avg NLL (bits/token)")
    sp.add_argument("--pack-capacity", type=int, default=256)

    sp = sub.add_parser("simulate", help="generate a deterministic synthetic change stream")
    sp.add_argument("--out", required=True)
    sp.add_argument("--events", type=int, default=10_000)
    sp.add_argument("--repos", type=int, default=50)
    sp.add_argument("--epochs", type=int, default=4)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--dirty", type=float, default=0.0)

    args = p.parse_args(argv)

    if args.cmd == "curate":
        _ray_up(args.num_cpus)
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.pipelines.curation import (
            curate_documents,
        )
        from maritime_activity_reports_cdc_ray.sources.writers import (
            write_partitioned,
        )

        ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
        kept, stats = curate_documents(ds, apply_c4=not args.no_c4,
                                       min_quality_score=args.min_quality,
                                       lm_t_low_bits=args.lm_low,
                                       lm_t_high_bits=args.lm_high,
                                       pack_capacity=args.pack_capacity)
        w = write_partitioned(kept, args.out, by="lang_pred")
        print(json.dumps({**stats, **w, "out": args.out}))
        return 0

    if args.cmd == "simulate":
        from maritime_activity_reports_cdc_ray.generate import generate_events

        files = generate_events(args.out, n_events=args.events, n_repos=args.repos,
                                n_epochs=args.epochs, seed=args.seed,
                                dirty_fraction=args.dirty)
        print(json.dumps({"files": len(files), "out": args.out}))
        return 0

    r = _replay(args)
    if args.cmd == "setup":
        r.setup()
        print(json.dumps({"status": "created", "root": args.root}))
        return 0

    if args.cmd == "health":
        from maritime_activity_reports_cdc_ray.pipelines.maintenance import health_check

        print(json.dumps(health_check(r), indent=1))
        return 0

    if args.cmd == "analyze":
        from maritime_activity_reports_cdc_ray.state.zonemap import column_stats

        lake, kind = {"silver": (r.silver, "current"),
                      "history": (r.silver, "history"),
                      "gold": (r.gold, "gold")}[args.table]
        print(json.dumps(column_stats(lake.latest_manifest(), kind=kind),
                         indent=1, sort_keys=True))
        return 0

    if args.cmd == "metrics":
        out = r.epoch_history() if args.history else r.stream_metrics()
        print(json.dumps(out, indent=1))
        return 0

    if args.cmd == "vacuum":
        removed = sum((t.vacuum() for t in (r.bronze, r.silver, r.gold)))
        print(json.dumps({"files_removed": removed}))
        return 0

    if args.cmd == "restore":
        # pure manifest-file operation — no Ray session needed
        print(json.dumps(r.restore(args.epoch)))
        return 0

    if args.cmd == "history":
        # pure manifest-file operation — no Ray session needed
        t = {"bronze": r.bronze, "silver": r.silver, "gold": r.gold}[args.table]
        print(json.dumps(t.describe_history()[:args.limit], indent=1))
        return 0

    if args.cmd == "clone":
        # pure manifest-file operation — no Ray session needed
        dst = r.clone(args.dst, as_of_epoch=args.as_of_epoch)
        dm = dst.silver.latest_manifest()
        print(json.dumps({"dst": args.dst, "silver_epoch": dm.epoch,
                          "fragments": len(dm.fragments)}))
        return 0

    if args.cmd == "gold" and args.status:
        # pure manifest-file operation — no Ray session needed
        from maritime_activity_reports_cdc_ray.pipelines.gold_consumer import GoldConsumer

        print(json.dumps(GoldConsumer(r).status()))
        return 0

    _ray_up(args.num_cpus)
    import ray

    try:
        if args.cmd == "gold":
            from maritime_activity_reports_cdc_ray.pipelines.gold_consumer import GoldConsumer

            c = GoldConsumer(r)
            out = c.step() if args.step else c.refresh(args.to_epoch)
            print(json.dumps({**out, **c.status()}))
        elif args.cmd == "replay":
            out = r.run(args.input, files_per_epoch=args.files_per_epoch,
                        max_epochs=args.max_epochs)
            print(json.dumps(out))
        elif args.cmd == "ingest":
            out = r.run(args.input, files_per_epoch=args.files_per_epoch, max_epochs=1)
            print(json.dumps(out))
        elif args.cmd == "supervise":
            from maritime_activity_reports_cdc_ray.pipelines.supervisor import StreamSupervisor

            sup = StreamSupervisor(lambda: _replay(args), args.input,
                                   files_per_epoch=args.files_per_epoch,
                                   poll_interval=args.poll_interval,
                                   max_restarts=args.max_restarts)
            out = sup.run(max_polls=args.max_polls,
                          stop_when_idle=args.max_polls is None)
            print(json.dumps(out))
        elif args.cmd == "view":
            from maritime_activity_reports_cdc_ray.pipelines.views import IncrementalAggView

            v = IncrementalAggView(
                r, args.name, args.group_cols.split(","),
                [c for c in args.sum_cols.split(",") if c])
            out = v.refresh()
            out["state"] = json.loads(
                v.read().head(args.limit).to_json(orient="records"))
            print(json.dumps(out, indent=1))
        elif args.cmd == "delete":
            col, _, val = args.where.partition("=")
            vals = val.split(",")
            pred = (col, "==", vals[0]) if len(vals) == 1 else (col, "in", vals)
            print(json.dumps(r.make_tombstones(pred, args.out)))
        elif args.cmd == "update":
            col, _, val = args.where.partition("=")
            vals = val.split(",")
            pred = (col, "==", vals[0]) if len(vals) == 1 else (col, "in", vals)
            scol, _, sval = args.set_expr.partition("=")
            if scol not in ("lang", "content"):
                raise SystemExit("--set supports lang=... or content=...")
            print(json.dumps(r.make_updates(pred, {scol: sval}, args.out)))
        elif args.cmd == "export":
            from maritime_activity_reports_cdc_ray.sources.writers import write_partitioned

            cols = args.columns.split(",") if args.columns else None
            if args.table == "silver":
                ds = r.read_silver(columns=cols, as_of_epoch=args.as_of_epoch)
            elif args.table == "gold":
                ds = r.read_gold(as_of_epoch=args.as_of_epoch)
            else:
                ds = r.read_history(as_of_epoch=args.as_of_epoch)
            if cols and args.table != "silver":
                # gold/history readers take no column pushdown — honor the
                # flag with a post-read projection rather than ignoring it
                ds = ds.select_columns(cols)
            out = write_partitioned(ds, args.dest, args.partition_by,
                                    compression=r.cfg.write_compression)
            print(json.dumps({"table": args.table, "dest": args.dest, **out}))
        elif args.cmd == "stream-window":
            from maritime_activity_reports_cdc_ray.pipelines.streaming import StreamingWindowAgg

            w = StreamingWindowAgg(
                r, args.name, args.window_size, args.group_cols.split(","),
                [c for c in args.sum_cols.split(",") if c])
            out = w.refresh()
            if args.flush:
                out["flush"] = w.flush()
            out["results"] = json.loads(
                w.results().head(args.limit).to_json(orient="records"))
            print(json.dumps(out, indent=1))
        elif args.cmd == "remat":
            from maritime_activity_reports_cdc_ray.pipelines.maintenance import (
                rematerialize_content,
            )

            print(json.dumps(rematerialize_content(
                r, retain_epochs=args.retain_epochs,
                compression=r.cfg.write_compression)))
        elif args.cmd == "compact":
            from maritime_activity_reports_cdc_ray.pipelines.maintenance import compact_table

            lake = r.silver if args.table == "silver" else r.gold
            kinds = ("history", "current") if args.table == "silver" else ("gold",)
            cluster = args.cluster_by.split(",") if args.cluster_by else None
            if args.zorder and not (cluster and 2 <= len(cluster) <= 4):
                raise SystemExit(
                    "--zorder needs 2-4 --cluster-by columns "
                    "(one column is a plain sort — drop --zorder)")
            out = {}
            if args.target_fragment_rows and args.table == "silver":
                # splitting applies to history only; current fragments are
                # compacted unsplit in a second pass
                out["history"] = compact_table(
                    lake, kinds=("history",), compression=r.cfg.write_compression,
                    cluster_by=cluster, row_group_size=args.row_group_size,
                    include_single=args.include_single, zorder=args.zorder,
                    target_fragment_rows=args.target_fragment_rows)
                out["current"] = compact_table(
                    lake, kinds=("current",), compression=r.cfg.write_compression,
                    cluster_by=cluster, row_group_size=args.row_group_size,
                    include_single=args.include_single, zorder=args.zorder)
            else:
                out = compact_table(
                    lake, kinds=kinds, compression=r.cfg.write_compression,
                    cluster_by=cluster, row_group_size=args.row_group_size,
                    include_single=args.include_single, zorder=args.zorder,
                    target_fragment_rows=args.target_fragment_rows)
            print(json.dumps(out))
        elif args.cmd == "read":
            cols = args.columns.split(",") if args.columns else None
            pred = None
            if args.where:
                col, _, val = args.where.partition("=")
                vals = val.split(",")
                pred = (col, "==", vals[0]) if len(vals) == 1 else (col, "in", vals)
            if args.table == "silver":
                ds = r.read_silver(columns=cols, as_of_epoch=args.as_of_epoch,
                                   predicate=pred)
            elif args.table == "gold":
                ds = r.read_gold(as_of_epoch=args.as_of_epoch, predicate=pred)
            elif args.table == "quarantine":
                ds = _post_filter(r.read_quarantine(), pred)
            elif args.table == "changes":
                ds = _post_filter(
                    r.table_changes(args.from_epoch, args.as_of_epoch,
                                    columns=cols), pred)
            else:
                ds = r.read_history(as_of_epoch=args.as_of_epoch, predicate=pred)
            from maritime_activity_reports_cdc_ray import collect_pandas

            # arrow-first collect: a lake with nested evolved columns would
            # fail Dataset.to_pandas()'s TensorArray cast
            rows = collect_pandas(ds.limit(args.limit))
            print(json.dumps({"table": args.table, "as_of_epoch": args.as_of_epoch,
                              "rows": json.loads(rows.to_json(orient="records"))},
                             indent=1))
        elif args.cmd == "verify":
            from maritime_activity_reports_cdc_ray.oracle import replay_files
            from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

            files = [f for ep in CDCReplay.discover_epochs(args.input) for f in ep]
            oracle = replay_files(files)
            exp = oracle.expected_silver()
            from maritime_activity_reports_cdc_ray import collect_pandas

            sil = collect_pandas(r.read_silver())
            eng = {(row.repo, row.path): (row.commit, row.content_sha256, row.version_count)
                   for row in sil.itertuples()}
            ok = set(eng) == set(exp) and all(
                eng[k] == (v["commit"], v["content_sha256"], v["version_count"])
                for k, v in exp.items()
            )
            print(json.dumps({"verified": bool(ok), "live_keys": len(eng),
                              "expected": len(exp)}))
            return 0 if ok else 1
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
