"""Engine configuration.

The reference drives everything from a Pydantic+YAML config
(``models/config.py:95-169``); ours is a plain dataclass so the engine has zero
dependencies beyond ray/pyarrow/numpy/pandas. All knobs that matter at 100 TB
scale are here, with small-scale test defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Knobs for a lake (bronze/silver/gold table triple) and its replay.

    Scale guidance (the sandbox tests at sf<=0.1 on one node; production target
    is a fixed-size multi-node cluster streaming ~100 TB):

    - ``num_partitions``: number of logical silver/gold key partitions
      (``pid = hash(repo) % num_partitions``). Fragment granularity and merge
      parallelism both derive from it. 32-256 for tests; O(64k) at 100 TB so a
      single partition's current fragment stays ~1-2 GB and a merge task's
      working set stays well under a worker's heap.
    - ``default_salt`` / ``max_salt``: sub-partitioning of a pid by
      ``hash(path) % salt``. Salting bounds the working set of a *hot* pid
      (mega-repo skew — reference analogue: Spark AQE skew join,
      ``utils/spark_utils.py:31-33``). The salt map is adapted per epoch from
      lineage row counts; fragments are written per (pid, salt) slice so a
      salted merge group only reads/writes its slice.
    - ``shuffle_partitions``: physical blocks for the merge exchange
      (``Dataset.repartition(keys=...)``). ~2x total cores.
    """

    # --- partitioning ---
    num_partitions: int = 32
    shuffle_partitions: int = 0  # 0 → derive from cluster CPUs at run time
    default_salt: int = 1
    max_salt: int = 256
    # a (pid, epoch) whose incoming event count exceeds this gets its salt
    # doubled for subsequent epochs (and halved again when it cools down)
    hot_partition_rows: int = 250_000

    # --- validation / quality (reference: utils/data_quality.py:20-99) ---
    commit_regex: str = r"^c[0-9]{12}$"
    max_content_bytes: int = 1 << 20  # soft flag, not a hard drop
    known_langs: tuple[str, ...] = ("py", "rs", "go", "js", "md", "txt")
    min_quality_score: float = 0.0  # hard-drop threshold on the tiered score
    # dead-letter sink: when True, rows the validator drops (hard-invalid or
    # under min_quality_score) are written — with a reject_reason column — to
    # lake/quarantine/epoch=E/ for audit/repair instead of vanishing
    # (reference analogue: bad-record routing in production CDC ingest)
    quarantine_rejects: bool = False
    # declarative CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT / DLT
    # expectations analogue): tuples (name, column, op, value, policy) with
    # op in {==, !=, >, >=, <, <=, in, not_null, matches} and policy in
    # {"fail", "drop"}. SQL CHECK null semantics: a NULL operand SATISFIES
    # every op except not_null. policy="fail" aborts the epoch BEFORE any
    # commit (the run stays resumable); policy="drop" filters the row (and
    # dead-letters it with reason="check:<name>" when quarantine_rejects).
    check_constraints: tuple = ()

    # --- execution ---
    batch_size_rows: int | None = None  # None → whole blocks (zero-copy arrow)
    merge_num_cpus: float = 1.0
    write_compression: str = "zstd"
    # merge exchange shape:
    #   "bronze_bucket" — map-side-file exchange: the fused bronze persist
    #                  writes one fragment per (block, bucket) and merge tasks
    #                  read exactly their bucket — the all-to-all rides the
    #                  mandatory bronze write (filesystem / shared storage),
    #                  with no object-store shuffle, aggregator actors, or
    #                  sort barrier. Fused large epochs only; auto default.
    #   "hash_actor" — hash-shuffle operator + stateful actor pool (in-memory
    #                  exchange; the large-epoch path when bronze is already
    #                  committed, e.g. crash resume),
    #   "sort_task"  — sort-based groupby + task closures on warm workers
    #                  (no actor spin-up; wins when an epoch is small),
    #   "broadcast_task" — NO exchange at all: the mapped epoch is
    #                  materialized as object-store blocks and every merge
    #                  task fetches the whole (small) epoch zero-copy and
    #                  filters its bucket. Cost = nodes x epoch_bytes of
    #                  replication, so it is gated on epoch size; kills the
    #                  per-epoch sort barrier (~1 s wall for a 60k-row epoch,
    #                  measured) for micro-batch streams.
    #   "auto"       — bronze_bucket for fused epochs >= hash_exchange_min_rows,
    #                  hash_actor for unfused large epochs, broadcast_task
    #                  below broadcast_exchange_max_bytes, else sort_task.
    merge_exchange: str = "auto"
    # max (compressed input) epoch size for the broadcast_task exchange. Every
    # node holding a merge task replicates the whole epoch once into its
    # object store, so this bounds per-node network+memory cost at cluster
    # scale; 64 MB compressed ~= a few hundred MB in Arrow.
    broadcast_exchange_max_bytes: int = 64 << 20
    # measured crossover (32-CPU single node, 6M-row epochs): the hash/actor
    # exchange streams through its aggregators and overlaps the read — 59 s vs
    # 106 s for the sort/task path, whose sample→map→reduce barriers cost ~30 s
    # wall per epoch regardless of CPU count. Below ~1M rows the per-execution
    # actor + aggregator spin-up dominates and sort/task wins.
    hash_exchange_min_rows: int = 1_000_000
    # fuse the bronze fragment write into the silver merge execution (single
    # pipeline per epoch: read → stamp/validate → bronze side-effect write →
    # shuffle → merge). Disable to force the two-step path.
    fuse_bronze: bool = True
    # overlap bronze ingest of epoch k+1 with the silver merge of epoch k
    # (background thread). Engages only at hash_exchange_min_rows-sized
    # epochs. Default OFF: on a single node the unfused path re-reads bronze
    # from the shared disk and loses to the fused single-execution epoch
    # (measured 103 s vs 55 s on 2x6M rows); on a real multi-node cluster,
    # where scan bandwidth scales with nodes, the overlap is the right shape.
    pipeline_epochs: bool = False
    # overlap the NEXT epoch's fused map phase (read → stamp → validate →
    # bucketed bronze write) with the current epoch's merge + gold refresh
    # (background thread; bronze_bucket exchange only). Unlike
    # pipeline_epochs, the premapped work is never redone — its bucket files
    # ARE the merge's shuffle input — so it wins on one node too: the merge
    # phase's straggler-idle slots absorb the next epoch's scan. While a
    # premap is in flight the salt layout is pinned (lineage-driven salt
    # adaptation defers one epoch; per-epoch presalt raises still apply).
    premap_epochs: bool = True

    # --- event-time watermark / allowed lateness ---
    # The reference DECLARES ``watermark_delay: "10 minutes"``
    # (models/config.py:46) but never wires it; we implement the Spark
    # ``withWatermark`` semantics it names: the stream tracks the max event
    # time over all COMMITTED epochs (monotone, crash-safe — persisted in the
    # bronze manifest stats), and an epoch's validator drops rows whose event
    # time is older than ``previous max - watermark_delay``. Late rows go to
    # the quarantine dead-letter table (reason="late") when
    # ``quarantine_rejects`` is on, else vanish like Spark's. Event time is
    # parsed from the zero-padded digits of ``commit`` at
    # ``watermark_commit_slice`` (the commit encodes the source timestamp —
    # generate.py packs epoch-micros there); rows whose commit doesn't parse
    # get event time 0 (they're hard-invalid anyway). None = feature off.
    watermark_delay: int | None = None
    watermark_commit_slice: tuple[int, int] = (1, 13)

    # --- SCD2 change detection (reference G3, silver/cdf_processor.py:296-300) ---
    # when True, an applicable event whose watched state (alive, content
    # sha256, lang) equals the key's running state is a no-op: no history row,
    # no version bump, current row (incl. commit watermark) untouched.
    detect_changes: bool = False

    # --- gold refresh cadence (reference: gold/streaming_processor.py:98-105) ---
    # 0 (or None) fully DECOUPLES gold from the replay loop: silver advances
    # alone and a GoldConsumer (pipelines/gold_consumer.py) — the analogue of
    # the reference's independently-checkpointed silver→gold StreamingQuery,
    # gold/cdf_processor.py:75-80,125-130 — catches gold up on its own
    # cadence via its own watermark (the gold manifest epoch).
    gold_refresh_every_epochs: int = 1
    # auto-OPTIMIZE at run end: compact silver history/current chains when
    # any (pid, salt, kind) chain exceeds this many fragments (None/0 = off;
    # reference analogue: the Airflow-scheduled optimize-tables job)
    auto_compact_min_chain: int | None = None

    # --- lookup cache (reference G4, silver/streaming_processor.py:150-191) ---
    # when set, each epoch MERGEs its distinct key tuples into a keyed cache
    # table at <lake>/cache: matched keys bump access_count and refresh
    # last_accessed_epoch, new keys insert with count 1 (the reference's
    # spatial_enrichment_cache, with the deterministic epoch number standing
    # in for current_timestamp()). Empty tuple = no cache.
    lookup_cache_keys: tuple[str, ...] = ()

    # --- misc ---
    source_system: str = "repo-commit-stream"
    extra: dict = field(default_factory=dict)

    def resolved_shuffle_partitions(self, num_cpus: int) -> int:
        if self.shuffle_partitions:
            return self.shuffle_partitions
        return max(4, 2 * num_cpus)
