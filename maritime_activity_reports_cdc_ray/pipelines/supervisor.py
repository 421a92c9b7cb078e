"""Streaming supervisor: monitor the replay stream, auto-restart dead runs.

Reference: the silver processor keeps a monitor loop over its active
``StreamingQuery`` objects — polling ``lastProgress``/``isActive`` on an
interval, logging per-query rates, removing stopped queries and capturing
their exception (``silver/streaming_processor.py:193-235``) — and
``restart_failed_queries`` relaunches anything that died
(``silver/streaming_processor.py:254-277``). This engine's equivalent
watches the epoch replay loop instead of a Spark query handle:

- Each poll discovers the source directory and, when bronze/silver/gold lag
  the available epochs, runs the replay (and steps the independently-
  checkpointed gold consumer). New files appearing between polls are picked
  up exactly like a file-source micro-batch stream.
- A run that RAISES is the analogue of a dead query: the supervisor records
  the exception in its restart history (reference logs ``query.exception()``),
  tears the driver object down, rebuilds a FRESH ``CDCReplay`` from the
  factory, and retries with linear backoff — crash-safe resume (2PC
  manifests) guarantees the restarted run converges without double-applying.
- ``status()`` mirrors ``get_processing_statistics``: poll count, restart
  history, last stream metrics.

Bounded by ``max_polls``/``max_restarts`` so tests and CLI invocations
terminate; a production deployment passes ``max_polls=None`` and owns the
process lifetime.
"""

from __future__ import annotations

import time
import traceback


class StreamSupervisor:
    """Drive + monitor a CDC replay stream with auto-restart.

    ``replay_factory`` builds a fresh ``CDCReplay`` (fresh driver state —
    the restart analogue of relaunching a StreamingQuery); it is called once
    up front and once per restart.
    """

    def __init__(self, replay_factory, source_dir: str,
                 files_per_epoch: int = 1,
                 poll_interval: float = 1.0,
                 max_restarts: int = 3,
                 backoff_base: float = 0.0,
                 manage_gold: bool = True):
        self._factory = replay_factory
        self.source_dir = source_dir
        self.files_per_epoch = files_per_epoch
        self.poll_interval = poll_interval
        self.max_restarts = max_restarts
        self.backoff_base = backoff_base
        # manage_gold: on a DECOUPLED lake (gold_refresh_every_epochs=0 —
        # gold as its own checkpointed consumer) the supervisor also steps
        # the GoldConsumer each tick; without this, gold's lag would read as
        # permanently-pending work that replay.run() never clears (livelock)
        self.manage_gold = manage_gold
        self.replay = replay_factory()
        self.restart_history: list[dict] = []
        self.polls = 0
        self.epochs_run = 0
        self._metrics: dict = {}

    # ------------------------------------------------------------------
    def _pending(self) -> bool:
        """Work available? — undiscovered source epochs, or a committed tier
        lagging the one above it (the reference's 'active' condition)."""
        from maritime_activity_reports_cdc_ray.pipelines.replay import CDCReplay

        epochs = CDCReplay.discover_epochs(self.source_dir, self.files_per_epoch)
        m = self.replay.stream_metrics()
        if len(epochs) - 1 > m["bronze_epoch"] or m["silver_epoch"] < m["bronze_epoch"]:
            return True
        # gold lag is pending work only when this supervisor clears it —
        # replay.run() never advances a decoupled (cadence-0) gold, so
        # counting its lag without manage_gold would poll-loop forever
        return self.manage_gold and m["gold_epoch"] < m["silver_epoch"]

    def poll_once(self) -> dict:
        """One monitor tick: run pending work; on failure record + restart.

        Returns the poll record (also appended to ``status()``'s history).
        Raises ``RuntimeError`` once ``max_restarts`` consecutive failures
        are exhausted — a permanently-failing stream must fail loudly, not
        spin."""
        self.polls += 1
        rec: dict = {"poll": self.polls, "ran": False, "restarted": False}
        if not self._pending():
            self._metrics = self.replay.stream_metrics()
            rec["metrics"] = self._metrics
            return rec

        def attempt(fn, stage: str):
            """Run one stage under the dead-query discipline: capture the
            exception, rebuild a fresh driver, retry — every stage (replay
            AND the gold consumer step) gets the same restart budget."""
            failures = 0
            while True:
                try:
                    return fn()
                except Exception as e:
                    failures += 1
                    self.restart_history.append({
                        "poll": self.polls,
                        "stage": stage,
                        "attempt": failures,
                        "exception": f"{type(e).__name__}: {e}",
                        "traceback": traceback.format_exc(limit=3),
                        "at": time.time(),
                    })
                    if failures > self.max_restarts:
                        raise RuntimeError(
                            f"stream {stage} failed {failures} consecutive "
                            f"times (max_restarts={self.max_restarts}); "
                            f"last: {type(e).__name__}: {e}") from e
                    if self.backoff_base:
                        time.sleep(self.backoff_base * failures)
                    self.replay = self._factory()  # fresh driver state
                    rec["restarted"] = True

        out = attempt(lambda: self.replay.run(
            self.source_dir, files_per_epoch=self.files_per_epoch), "replay")
        self.epochs_run += out.get("epochs_run", 0)
        rec["ran"] = True
        rec["epochs_run"] = out.get("epochs_run", 0)
        if self.manage_gold:
            from maritime_activity_reports_cdc_ray.pipelines.gold_consumer import GoldConsumer

            def gold_step():
                g = GoldConsumer(self.replay)  # rebind post-restart replay
                return g.refresh() if g.lag() > 0 else None

            gout = attempt(gold_step, "gold-consumer")
            if gout is not None:
                rec["gold"] = gout
        self._metrics = self.replay.stream_metrics()
        rec["metrics"] = self._metrics
        return rec

    def run(self, max_polls: int | None = None,
            stop_when_idle: bool = False) -> dict:
        """Monitor loop (reference ``monitor_streaming_queries``): poll, run
        pending work, sleep ``poll_interval`` between ticks. Stops after
        ``max_polls`` ticks, or — with ``stop_when_idle`` — as soon as a tick
        finds nothing pending (drain semantics for tests/CLI)."""
        while True:
            rec = self.poll_once()
            if stop_when_idle and not rec["ran"]:
                break
            if max_polls is not None and self.polls >= max_polls:
                break
            time.sleep(self.poll_interval)
        return self.status()

    def status(self) -> dict:
        """``get_processing_statistics`` analogue."""
        return {
            "polls": self.polls,
            "epochs_run": self.epochs_run,
            "restarts": len(self.restart_history),
            "restart_history": self.restart_history,
            "metrics": self._metrics or self.replay.stream_metrics(),
        }
