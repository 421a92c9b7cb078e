"""Silver→gold as its OWN checkpointed stream.

The reference runs silver→gold as an independent ``StreamingQuery`` with its
own checkpoint location and trigger cadence (``gold/cdf_processor.py:75-80,
125-130``; checkpoints ``silver/cdf_processor.py:83-88``): gold can lag, die,
and catch up without touching silver. This module is that consumer for the
Ray engine. Its checkpoint is the GOLD MANIFEST EPOCH — already committed
2PC-atomically with every gold refresh — so the consumer carries no state of
its own: a crashed refresh simply re-runs (the idempotent-commit discipline
of the whole lake) and ``refresh()`` resumes from wherever gold last
committed, regardless of which process advanced it.

Run the replay with ``EngineConfig(gold_refresh_every_epochs=0)`` to fully
decouple (the loop then never dispatches gold), or any cadence — the consumer
only ever advances gold from its committed watermark, so it composes with an
in-loop cadence too (whoever runs first wins that epoch; both sides are
idempotent against the manifest).

Two verbs:

- :meth:`GoldConsumer.refresh` — catch gold up to the CURRENT silver
  watermark in one invocation (one scoped refresh folding all missed
  epochs' lineage, not one refresh per epoch — the affected-repo union is
  how the in-loop cadence already skips epochs).
- :meth:`GoldConsumer.step` — advance exactly ONE epoch, reading the
  time-travel silver manifest of that epoch, so a deliberately-lagging
  consumer (e.g. gold on a slow cadence, or a backfill after restore)
  reproduces bit-for-bit the gold states the inline loop would have
  committed. Valid until ``vacuum()`` prunes the pinned silver history —
  the standard log-consumer retention contract.

Scale shape: identical to the in-loop refresh — affected-repo scoped,
partition-local, zero shuffle (``stages/gold.py``); the consumer adds only
manifest reads.
"""

from __future__ import annotations


class GoldConsumer:
    def __init__(self, replay):
        self.replay = replay

    # --------------------------------------------------------------- status
    def watermark(self) -> int:
        """The consumer checkpoint: the last silver epoch folded into gold."""
        return self.replay.gold.latest_manifest().epoch

    def lag(self) -> int:
        """How many committed silver epochs gold has not consumed yet."""
        return (self.replay.silver.latest_manifest().epoch
                - self.replay.gold.latest_manifest().epoch)

    def status(self) -> dict:
        sm = self.replay.silver.latest_manifest()
        gm = self.replay.gold.latest_manifest()
        return {
            "silver_epoch": sm.epoch,
            "gold_epoch": gm.epoch,
            "lag_epochs": sm.epoch - gm.epoch,
            "status": "behind" if gm.epoch < sm.epoch else "caught-up",
        }

    # -------------------------------------------------------------- advance
    def refresh(self, to_epoch: int | None = None) -> dict:
        """Advance gold to ``to_epoch`` (default: the current silver
        watermark) in ONE scoped refresh — all missed epochs' affected-repo
        lineage is unioned, exactly like the in-loop cadence folding skipped
        epochs. Targeting an epoch below silver's latest pins the
        time-travel silver manifest so the produced gold is the state as of
        that epoch, not a mix."""
        self.replay._join_gold()
        sm = self.replay.silver.latest_manifest()
        gm = self.replay.gold.latest_manifest()
        target = sm.epoch if to_epoch is None else int(to_epoch)
        if target > sm.epoch:
            raise ValueError(
                f"cannot refresh gold to epoch {target}: silver has only "
                f"committed up to {sm.epoch}")
        if target <= gm.epoch:
            return {"status": "fresh", "gold_epoch": gm.epoch,
                    "epochs_consumed": 0}
        pinned = None if target == sm.epoch \
            else self.replay.silver.manifest_as_of(target)
        self.replay._gold_refresh_inner(target, pinned_silver=pinned)
        return {"status": "refreshed",
                "gold_epoch": self.replay.gold.latest_manifest().epoch,
                "epochs_consumed": target - gm.epoch}

    def step(self) -> dict:
        """Consume exactly one silver epoch (pinned time-travel read):
        repeated steps replay the inline loop's gold commit sequence."""
        gm = self.replay.gold.latest_manifest()
        if gm.epoch >= self.replay.silver.latest_manifest().epoch:
            return {"status": "fresh", "gold_epoch": gm.epoch,
                    "epochs_consumed": 0}
        return self.refresh(gm.epoch + 1)
