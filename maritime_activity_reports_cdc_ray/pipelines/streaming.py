"""Append-mode windowed streaming aggregation finalized by the watermark —
Spark Structured Streaming's ``groupBy(window(event_time), key).agg(...)``
with ``withWatermark`` in APPEND output mode (the reference configures exactly
this shape for its gold stream: trigger cadence + watermark_delay in
``models/config.py:44-46``; the semantics come from the Spark contract the
reference names but never wires).

Mechanics per :meth:`StreamingWindowAgg.refresh`:

1. read ONLY the bronze fragments of epochs newer than the consumer's
   watermark (manifest metadata selects the files; the read is
   column-pruned to ``time_col`` + group cols — payload never moves);
2. per-batch combiner: assign each row its tumbling window start
   (``t // size * size``) and reduce to partial (window, group) counts/sums —
   the shuffle moves partials, never rows (`hash_agg`);
3. merge the partials into the persisted OPEN-WINDOW state (state size =
   open windows × groups — bounded by the watermark, independent of stream
   length);
4. EMIT every window whose end <= the event-time watermark floor (late rows
   for those windows can no longer arrive — the validator already drops
   them), appending the finalized rows to the results table exactly once;
5. commit state + results + meta as one versioned directory swap (a crashed
   refresh reruns from the previous version and converges — same
   exactly-once discipline as the manifest sink).

A window is emitted exactly once, never updated afterward — the append-mode
contract that makes the results table safe to export downstream. Windows
still open when the stream ends are emitted by :meth:`flush`.

Scale shape: state and results are group-cardinality, not stream-cardinality;
the per-refresh input is one epoch-range of bronze (pruned at the manifest);
everything between is combiner-first. The consumer must keep up with bronze
retention (``rematerialize_content``) — same contract as any log consumer.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# NULL-group-key sentinel (same trick as functions/stats.py rollup_agg):
# pandas groupby drops NaN keys by default; Spark's groupBy(window, key)
# keeps them, and so do we.
_NULL_SENT = "\x00\x00__null__"


class StreamingWindowAgg:
    def __init__(self, replay, name: str, window_size: int,
                 group_cols: list[str] = ("lang",),
                 sum_cols: list[str] = (), time_col: str = "event_time",
                 num_partitions: int = 8):
        assert window_size > 0
        self.replay = replay
        self.name = name
        self.size = int(window_size)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.time_col = time_col
        self.num_partitions = int(num_partitions)
        self.dir = os.path.join(replay.root, "streaming", name)

    # ------------------------------------------------------------------ state
    def _latest(self) -> str | None:
        p = os.path.join(self.dir, "LATEST")
        if not os.path.exists(p):
            return None
        return os.path.join(self.dir, open(p).read().strip())

    def _meta(self) -> dict:
        v = self._latest()
        if v is None:
            return {"epoch": -1}
        return json.load(open(os.path.join(v, "meta.json")))

    def _cols(self) -> list[str]:
        return (["window_start", "window_end"] + self.group_cols + ["n"]
                + [f"sum_{c}" for c in self.sum_cols])

    @property
    def is_flushed(self) -> bool:
        """True once :meth:`flush` committed — the stream is terminal and
        only :meth:`results` remains valid (refresh() raises)."""
        return bool(self._meta().get("flushed"))

    def state(self) -> pd.DataFrame:
        """Open (not yet finalized) windows."""
        cols = self._cols()
        v = self._latest()
        fp = None if v is None else os.path.join(v, "state.parquet")
        if fp is None or not os.path.exists(fp):
            return pd.DataFrame(columns=cols)
        return pq.read_table(fp).to_pandas()[cols]

    def _result_segments(self, vdir: str) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(os.path.join(vdir, "results*.parquet")))

    def results(self) -> pd.DataFrame:
        """Finalized windows, append-only across refreshes — stored as
        per-emission SEGMENT files (a refresh appends one segment and
        hard-links the rest; already-emitted rows are never rewritten)."""
        cols = self._cols()
        v = self._latest()
        segs = self._result_segments(v) if v else []
        if not segs:
            return pd.DataFrame(columns=cols)
        return pa.concat_tables(
            [pq.read_table(f) for f in segs],
            promote_options="default").to_pandas()[cols]

    def _commit(self, epoch: int, state: pd.DataFrame,
                close: pd.DataFrame, emitted_total: int, tag: str = "",
                flushed: bool = False) -> None:
        """Versioned-dir swap: state rewrites (open-window-cardinality),
        results APPEND — prior segments carry over as hard links and only
        the newly finalized rows write, so the per-refresh result cost is
        O(emitted this refresh), not O(all ever emitted)."""
        vdir = os.path.join(self.dir, f"v{epoch:010d}{tag}")
        shutil.rmtree(vdir, ignore_errors=True)  # crashed prior attempt
        os.makedirs(vdir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(state, preserve_index=False),
                       os.path.join(vdir, "state.parquet"))
        prev = self._latest()
        if prev:
            for f in self._result_segments(prev):
                dst = os.path.join(vdir, os.path.basename(f))
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
        if len(close):
            pq.write_table(pa.Table.from_pandas(close, preserve_index=False),
                           os.path.join(vdir, f"results-{epoch:010d}{tag}.parquet"))
        with open(os.path.join(vdir, "meta.json"), "w") as f:
            json.dump({"epoch": epoch, "open_windows": len(state),
                       "emitted_windows": int(emitted_total),
                       "flushed": flushed}, f)
        fd, tmp = tempfile.mkstemp(dir=self.dir)
        os.close(fd)
        with open(tmp, "w") as f:
            f.write(os.path.basename(vdir))
        os.replace(tmp, os.path.join(self.dir, "LATEST"))
        if prev and os.path.realpath(prev) != os.path.realpath(vdir):
            shutil.rmtree(prev, ignore_errors=True)

    # ---------------------------------------------------------------- refresh
    def _delta(self, lo_epoch: int, hi_epoch: int) -> pd.DataFrame:
        """Partial (window, group) aggregates over bronze epochs in
        (lo, hi] — manifest-pruned files, column-pruned read, combiner-first
        reduce. Returns group-cardinality rows to the driver."""
        import ray.data as rd

        from maritime_activity_reports_cdc_ray.functions.stats import hash_agg

        bm = self.replay.bronze.latest_manifest()
        files = [self.replay.bronze.abspath(f.path) for f in bm.fragments
                 if f.kind == "data" and lo_epoch < f.epoch <= hi_epoch]
        cols = ["window_start"] + self.group_cols + ["n"] \
            + [f"sum_{c}" for c in self.sum_cols]
        if not files:
            return pd.DataFrame(columns=cols)
        ds = rd.read_parquet(files,
                             columns=[self.time_col] + self.group_cols
                             + self.sum_cols)
        size, tcol = self.size, self.time_col
        gcols, scols = list(self.group_cols), list(self.sum_cols)

        def windows(df: pd.DataFrame) -> pd.DataFrame:
            # a null event_time row has no window (Spark: a null timestamp
            # falls out of the window groupby) — drop before the int cast,
            # which would raise on the NaN and wedge the consumer forever
            df = df[df[tcol].notna()]
            if not len(df):
                return pd.DataFrame({c: pd.Series(dtype="int64" if c not in
                                                  gcols else object)
                                     for c in ["window_start", "n"] + gcols
                                     + scols})
            t = df[tcol].astype("int64")
            out = df[gcols].copy()
            # NULL group keys are real groups (Spark groupBy keeps them;
            # pandas' dropna would silently drop their rows) — sentinel
            # through the combiner, restored to None after the reduce
            for k in gcols:
                if out[k].isna().any():
                    out[k] = out[k].astype(object).where(out[k].notna(),
                                                         _NULL_SENT)
            out["window_start"] = (t // size * size).to_numpy()
            out["n"] = 1
            for c in scols:
                out[c] = df[c].to_numpy()
            return out

        aggs = {"n": ("n", "sum")}
        for c in scols:
            aggs[f"sum_{c}"] = (c, "sum")
        delta = hash_agg(ds.map_batches(windows, batch_format="pandas"),
                         ["window_start"] + gcols, aggs,
                         num_partitions=self.num_partitions).to_pandas()
        for k in gcols:  # sentinel back to a real NULL group key
            if (delta[k] == _NULL_SENT).any():
                delta[k] = delta[k].where(delta[k] != _NULL_SENT, None)
        return delta.drop(columns=[c for c in ("_part",) if c in delta])

    def _emit_floor(self, consumed_epoch: int) -> int | None:
        """Emission floor pinned to the CONSUMED snapshot, with premap
        slack: the validator admits epoch j's rows against a floor read from
        a bronze manifest at epoch >= j-2 (premap overlap is 'one epoch
        laxer' — see ``CDCReplay._watermark_floor``), so any FUTURE epoch's
        admitted row has event_time >= max_event_time(as of consumed-1) −
        delay. Emitting against that bound guarantees no already-emitted
        window can receive another row. Reading the LIVE floor instead would
        race a concurrent run(): a fresher epoch's floor finalizes windows
        whose rows we have not consumed yet, double-emitting them later."""
        if self.replay.cfg.watermark_delay is None or consumed_epoch < 1:
            return None
        m = self.replay.bronze.manifest_as_of(consumed_epoch - 1)
        met = (m.stats or {}).get("max_event_time")
        if met is None:
            return None
        return int(met) - int(self.replay.cfg.watermark_delay)

    def refresh(self) -> dict:
        """Consume bronze epochs since the consumer watermark, update open
        windows, emit the ones finalized by the event-time watermark."""
        meta = self._meta()
        if meta.get("flushed"):
            # flush() is terminal: re-consuming after it would re-emit
            # already-finalized (window, group) rows, breaking the
            # append-exactly-once contract
            raise RuntimeError(
                f"streaming consumer '{self.name}' was flushed (end-of-"
                "stream); it cannot refresh again — create a new consumer "
                "for the continuation")
        bm = self.replay.bronze.latest_manifest()
        cur = bm.epoch
        e = int(meta["epoch"])
        if cur <= e:
            return {"status": "fresh", "epoch": e, "emitted": 0}

        delta = self._delta(e, cur)
        state = self.state().drop(columns=["window_end"])
        # loud driver-state contract (the GROUP_RESULT_DRIVER_LIMIT pattern):
        # open-window state is bounded by watermark x group cardinality —
        # past the limit the key is too fine for a driver-merged stream
        from maritime_activity_reports_cdc_ray.functions.stats import \
            GROUP_RESULT_DRIVER_LIMIT

        if len(state) + len(delta) > GROUP_RESULT_DRIVER_LIMIT:
            raise ValueError(
                f"StreamingWindowAgg[{self.name}]: {len(state) + len(delta)} "
                f"open (window, group) rows exceed the driver-state contract "
                f"({GROUP_RESULT_DRIVER_LIMIT}); widen the watermark/window "
                "so windows finalize, coarsen the group key, or maintain the "
                "aggregate as a hash-partitioned IncrementalAggView")
        merged = pd.concat([state, delta], ignore_index=True)
        if len(merged):
            # dropna=False: NULL group keys are real groups (see _NULL_SENT)
            merged = (merged.groupby(["window_start"] + self.group_cols,
                                     as_index=False, sort=False,
                                     dropna=False).sum())
        merged["window_end"] = merged.get(
            "window_start", pd.Series(dtype="int64")) + self.size

        floor = self._emit_floor(cur)
        if floor is None:
            close = merged.iloc[0:0]
            stay = merged
        else:
            fin = merged["window_end"] <= floor
            close, stay = merged[fin], merged[~fin]
        cols = self._cols()
        emitted_total = (int(self._meta().get("emitted_windows", 0))
                         + len(close))
        stay = stay[cols].sort_values(["window_start"] + self.group_cols) \
            .reset_index(drop=True)
        self._commit(cur, stay, close[cols].reset_index(drop=True),
                     emitted_total)
        return {"status": "refreshed", "epoch": cur, "emitted": len(close),
                "open_windows": len(stay)}

    def flush(self) -> dict:
        """End-of-stream: finalize every still-open window (Spark's
        query-stop semantics — no more data can arrive). TERMINAL: the
        flushed flag is committed with the results, and any later
        :meth:`refresh` raises — re-consuming after a flush would re-emit
        already-finalized (window, group) rows. Idempotent."""
        if self._meta().get("flushed"):
            return {"status": "flushed", "emitted": 0}
        st = self.state()
        emitted_total = int(self._meta().get("emitted_windows", 0)) + len(st)
        self._commit(int(self._meta()["epoch"]), st.iloc[0:0],
                     st[self._cols()].reset_index(drop=True), emitted_total,
                     tag="-flush", flushed=True)
        return {"status": "flushed", "emitted": len(st)}
