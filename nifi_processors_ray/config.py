"""Engine configuration — the property-descriptor system reborn.

The reference configures its processors through typed, validated,
defaulted NiFi property descriptors (18 consumer / 20 producer:
``consumer/AbstractKinesisConsumerProcessor.java:62-224``,
``producer/AbstractKinesisProducerProcessor.java:30-189``,
``KinesisPropertyDescriptors.java:31-51``) with cross-field validation
in ``customValidate`` (``consumer/AbstractKinesisConsumerProcessor.java:
289-316``).  Here that surface is a frozen dataclass validated at
construction time — the whole pipeline config fails fast before any
data movement, like NiFi's flow-configuration-time validation.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field, replace


class ConfigError(ValueError):
    """Raised for invalid engine configuration (the customValidate analog)."""


# Initial-position enum — the reference's LATEST / TRIM_HORIZON
# (``consumer/AbstractKinesisConsumerProcessor.java:84-95``).
TRIM_HORIZON = "TRIM_HORIZON"   # replay from the beginning of the retained log
LATEST = "LATEST"               # start at the tail

_ALLOWED_INITIAL_POSITIONS = (TRIM_HORIZON, LATEST)


@dataclass(frozen=True)
class EngineConfig:
    """Validated engine configuration.

    Field → reference-descriptor lineage:

    - ``lake_dir`` / ``changelog_paths``: the stream-name descriptor
      (``KinesisPropertyDescriptors.java:31-41``) generalized to URIs.
    - ``batch_size``: consumer/producer batch size, 1..500 default 250
      in the reference (``KinesisPropertyDescriptors.java:43-51``) —
      here it is rows per Arrow batch, so the bound is much higher.
    - ``epoch_events``: the consumer's max-records-per-request
      (``consumer/AbstractKinesisConsumerProcessor.java:109-116``)
      generalized to the replay window size.  The window is a SEQ
      RANGE, not an event count: on a stream with sequence gaps
      (compaction upstream, per-shard interleaves) an epoch carries
      fewer events than the nominal size — correct (exactly-once holds,
      pinned by the seq-gap probe) but worth sizing for if the stream's
      seq density is far below 1.
    - ``initial_position``: LATEST / TRIM_HORIZON.
    - ``num_partitions`` (P): number of hash partitions of the lake —
      the shard-count analog.  At cluster scale, P should be ≥ 4× total
      cores so the merge stage never has fewer tasks than slots.
    - ``salt_factor`` (S): static skew fan-out.  A conversation's turns
      are spread over ``min(S, P)`` partitions by salting the conv_id
      hash with ``hash(turn_idx) % S`` — see ``stages/partition.py`` for
      why the salt must be a pure function of the key (lake placement
      stability), unlike the reference's random-key fallback
      (``producer/PutKinesisStream.java:267-269``).
    - ``max_attempts``: per-record attempt lineage depth
      (``producer/PutKinesisStream.java:287-301``); batches that fail
      ``max_attempts`` times dead-letter instead of failing the run.
    """

    lake_dir: str
    changelog_paths: tuple[str, ...] = ()
    batch_size: int = 65536
    epoch_events: int = 2_000_000
    initial_position: str = TRIM_HORIZON
    num_partitions: int = 32
    salt_factor: int = 4
    merge_concurrency: int | None = None   # actors in the merge pool; None = task-based
    # Write strategy: 'cow' rewrites a touched partition wholly per epoch
    # (read-optimal; write amplification ∝ lake size); 'mor' appends
    # per-epoch delta files and auto-compacts a partition when it
    # reaches `compact_threshold` files (write amplification ∝ change
    # volume — the 10^10-event setting).
    # 'auto' (the default) picks PER PARTITION per epoch: delta-append
    # (mor) when the epoch's change volume is a small fraction of the
    # partition (< auto_mor_ratio), full rewrite (cow) when most of the
    # partition changes anyway or it has no base yet — write
    # amplification tracks the change ratio instead of being a global
    # either/or.  At 10^10-event scale (key cardinality >> epoch size)
    # this is the MOR regime, where the measured crossover
    # (BENCH/CROSSOVER_16M.json) shows delta-append 1.5x faster per
    # epoch at a 1% change ratio and never slower; on small-cardinality
    # update-heavy streams it degrades gracefully to COW's read-optimal
    # single file.  Explicit 'cow'/'mor' force one strategy.
    merge_mode: str = "auto"
    auto_mor_ratio: float = 0.2
    compact_threshold: int = 8
    max_attempts: int = 3
    # COW data writes split into files of at most this many rows — the
    # reference's aggregation-max-size analog
    # (``producer/AbstractKinesisProducerProcessor.java:40-68``); a
    # resumable/parallel reader wants bounded files, never one giant one.
    target_rows_per_file: int = 1_000_000
    # ------------------------------------------------------------------
    # User-extension seam — the ``RecordsHandler`` analog
    # (``consumer/RecordsHandler.java:29-52``; injected via ``makeWorker``
    # / ``makeProducer``, ``consumer/GetKinesisStream.java:205-211``,
    # ``producer/PutKinesisStream.java:207-209``).  Users plug logic into
    # the per-shard machinery without forking the engine:
    #
    # - ``enrich``: ``Callable[[pa.Table], pa.Table]`` applied per batch
    #   BETWEEN validate and partition.  May add/modify payload columns
    #   (extra columns persist through the merge into the lake) but must
    #   preserve the changelog envelope columns (seq/op/conv_id/turn_idx/
    #   batch_id/reject_reason) — enforced at runtime.
    # - ``merge_policy``: ``Callable[[pa.Table], pa.Table]`` receiving the
    #   concatenated DELTA-shaped candidate rows for a partition (lake
    #   prior + epoch changes, incl. ``deleted`` tombstone flags) and
    #   returning the winning row per (conv_id, turn_idx) key.  ``None``
    #   means last-writer-wins by max seq (``stages.merge.lww_policy``).
    #   The policy must keep the input schema and emit at most one row
    #   per key; winning tombstones are filtered by the engine afterward.
    enrich: Callable | None = None
    merge_policy: Callable | None = None
    # Credentials-style knobs kept for config-surface parity (the reference's
    # access-key/secret/credentials-file triple, validated together):
    access_key: str | None = None
    secret_key: str | None = None
    credentials_file: str | None = None

    def __post_init__(self) -> None:
        if not self.lake_dir:
            raise ConfigError("lake_dir is required and must be non-empty")
        if not (1 <= self.batch_size <= 10_000_000):
            raise ConfigError(f"batch_size must be in [1, 10_000_000], got {self.batch_size}")
        if self.epoch_events < 1:
            raise ConfigError("epoch_events must be >= 1")
        if self.initial_position not in _ALLOWED_INITIAL_POSITIONS:
            raise ConfigError(
                f"initial_position must be one of {_ALLOWED_INITIAL_POSITIONS}, "
                f"got {self.initial_position!r}"
            )
        if self.num_partitions < 1:
            raise ConfigError("num_partitions must be >= 1")
        if self.salt_factor < 1:
            raise ConfigError("salt_factor must be >= 1")
        if self.max_attempts < 1:
            raise ConfigError("max_attempts must be >= 1")
        if self.merge_mode not in ("cow", "mor", "auto"):
            raise ConfigError(
                f"merge_mode must be 'cow', 'mor' or 'auto', got {self.merge_mode!r}"
            )
        if not (0.0 < self.auto_mor_ratio <= 1.0):
            raise ConfigError("auto_mor_ratio must be in (0, 1]")
        if self.compact_threshold < 1:
            raise ConfigError("compact_threshold must be >= 1")
        if self.target_rows_per_file < 1:
            raise ConfigError("target_rows_per_file must be >= 1")
        if self.enrich is not None and not callable(self.enrich):
            raise ConfigError("enrich must be a callable (pa.Table -> pa.Table) or None")
        if self.merge_policy is not None and not callable(self.merge_policy):
            raise ConfigError("merge_policy must be a callable (pa.Table -> pa.Table) or None")
        # Cross-field rules, mirroring customValidate
        # (consumer/AbstractKinesisConsumerProcessor.java:289-316):
        if (self.access_key is None) != (self.secret_key is None):
            raise ConfigError("access_key and secret_key must be set together")
        if self.credentials_file is not None and self.access_key is not None:
            raise ConfigError("credentials_file and access/secret keys are mutually exclusive")
        if self.credentials_file is not None and not os.path.exists(self.credentials_file):
            raise ConfigError(f"credentials_file does not exist: {self.credentials_file}")

    # Derived paths -------------------------------------------------------
    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.lake_dir, "_manifest")

    @property
    def staging_dir(self) -> str:
        return os.path.join(self.lake_dir, "_staging")

    @property
    def data_dir(self) -> str:
        return os.path.join(self.lake_dir, "data")

    @property
    def rejected_dir(self) -> str:
        return os.path.join(self.lake_dir, "rejected")

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.lake_dir, "lineage")

    def with_(self, **kwargs) -> "EngineConfig":
        return replace(self, **kwargs)
