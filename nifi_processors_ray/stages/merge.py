"""Hash-partitioned LWW merge/upsert — the ``PutKinesisStream`` role,
upgraded to exactly-once.

The reference's sink batches records, routes each to a shard by
partition key, writes asynchronously, and records per-attempt lineage
(``producer/PutKinesisStream.java:243-334,343-364``) — at-least-once.
Here the sink is a *lake merge*: after the one hash shuffle
(``groupby(__part)``), each partition group is handed to a
``MergeApplier`` actor (callable class → Ray actor pool via
``map_groups``; one stateful processor per shard with shared injected
logic, the ``KinesisRecordProcessorFactory`` pattern,
``consumer/KinesisRecordProcessorFactory.java:28-50``) that performs a
copy-on-write read-merge-write:

1. route rows flagged by the validate stage to the ``rejected`` side
   table (NiFi's failure relationship);
2. drop rows at-or-below the partition watermark (idempotent replay —
   a retried task rewrites byte-identical files at the SAME paths);
3. read the partition's current lake files (from the broadcast manifest
   snapshot — ``ray.put`` once, read per actor in ``__init__``);
4. unify schemas (late ``tool`` column, widened types) via Arrow
   schema unification;
5. apply last-writer-wins by max ``seq`` per ``(conv_id, turn_idx)``;
   a winning tombstone (op='D') removes the key — tombstones are
   compacted at this commit, they never persist in the lake;
6. write the partition's new file(s) to deterministic final paths
   (invisible until the manifest commit — phase 1 of the 2PC);
7. emit a lineage row (the producer's per-attempt result attributes).

Memory stays bounded at scale: an actor holds ONE partition's data at a
time (lake_size/P + epoch_changes/P), never whole-table state.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..schema import CHANGELOG_SCHEMA, LINEAGE_SCHEMA, align_to_schema, unify_schemas
from .partition import PARTITION_COL
from .validate import split_rejects

# Lake data files persist the transcript payload plus the applied seq
# (needed as the LWW tiebreaker for future merges and for lineage).
LAKE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("seq", pa.int64()),
    ]
)

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# Delta files (merge-on-read mode) additionally persist the tombstone
# flag: a winning delete must survive as data until compaction folds it.
DELTA_SCHEMA = pa.schema(list(LAKE_SCHEMA) + [pa.field("deleted", pa.bool_())])

# Columns that are engine envelope/bookkeeping, never user payload.  Any
# OTHER column present on a change batch is an enrichment column (added by
# the injected ``enrich`` hook — the RecordsHandler seam) and persists
# through the merge into the lake, like the late ``tool`` column does.
_ENVELOPE_COLS = frozenset(
    [f.name for f in CHANGELOG_SCHEMA] + ["deleted", "reject_reason", PARTITION_COL]
)


def _extra_fields(schema: pa.Schema) -> list[pa.Field]:
    """Enrichment fields (user payload beyond the core schemas), name-sorted
    so every producer emits them in one deterministic order."""
    return sorted(
        (f for f in schema if f.name not in _ENVELOPE_COLS), key=lambda f: f.name
    )


def _delta_schema_for(extras: list[pa.Field]) -> pa.Schema:
    return pa.schema(list(LAKE_SCHEMA) + list(extras) + [pa.field("deleted", pa.bool_())])


def _changes_to_delta(changes: pa.Table) -> pa.Table:
    """CHANGELOG rows → DELTA rows (op column → deleted flag).

    Enrichment columns (anything beyond the changelog envelope) ride
    through unchanged."""
    extras = _extra_fields(changes.schema)
    t = align_to_schema(changes, pa.schema(list(CHANGELOG_SCHEMA) + extras))
    deleted = pc.fill_null(pc.equal(t.column("op"), "D"), False)
    out = t.select([f.name for f in LAKE_SCHEMA] + [f.name for f in extras])
    return out.append_column("deleted", deleted).cast(_delta_schema_for(extras))


def _as_delta(table: pa.Table) -> pa.Table:
    """LAKE- or DELTA-shaped (possibly schema-drifted) table → DELTA
    (+ any enrichment columns the file carries)."""
    extras = _extra_fields(table.schema)
    base = _delta_schema_for(extras)
    target = unify_schemas(base, table.schema)
    ordered = pa.schema([target.field(f.name) for f in base])
    t = align_to_schema(table, ordered)
    return t.set_column(
        t.schema.get_field_index("deleted"),
        "deleted",
        pc.fill_null(t.column("deleted"), False),
    )


def _last_per_key(t: pa.Table) -> pa.Table:
    """Keep each (conv_id, turn_idx) key's max-seq row (t: DELTA-shaped).

    Single-threaded pyarrow kernels on purpose: this runs with one task
    per CPU slot — a per-task parallel runtime (polars' global thread
    pool) would oversubscribe the node (measured: 50-70ms/group alone →
    seconds/group under 16-way task contention; 14ms/group this way).
    """
    idx = pc.sort_indices(
        t,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"), ("seq", "ascending")],
    )
    t = t.take(idx).combine_chunks()
    n = t.num_rows
    if n == 0:
        return t
    conv, turn = t.column("conv_id"), t.column("turn_idx")
    if n > 1:
        same_next = pc.and_(
            pc.equal(conv.slice(0, n - 1), conv.slice(1)),
            pc.equal(turn.slice(0, n - 1), turn.slice(1)),
        ).combine_chunks()
        not_last = pa.chunked_array([same_next, pa.array([False])])
    else:
        not_last = pa.chunked_array([pa.array([False])])
    return t.filter(pc.invert(pc.fill_null(not_last, False)))


# The default merge policy: last-writer-wins by max seq per key.  A
# user-injected ``merge_policy`` (EngineConfig) receives the same
# DELTA-shaped candidate table and must return the winning row per key —
# the merge-policy half of the RecordsHandler seam.
#
# Associativity contract: under ``merge_mode='mor'`` (and 'auto', which
# may pick it) the policy runs in two stages — once within each epoch
# when its delta file is written (``epoch_delta``), and again across
# base+deltas at read/compaction time — so the winner it picks from
# {policy(epoch candidates), prior} must equal the winner it would pick
# from the flat candidate set.  LWW (any max-by-total-order rule)
# satisfies this; a policy that votes across ALL candidate rows (e.g.
# majority-role) does not, and must be run with ``merge_mode='cow'``,
# which always applies the policy once over the flat prior+epoch set.
lww_policy = _last_per_key


def merge_deltas(tables: list[pa.Table], policy=None) -> pa.Table:
    """Resolve base + delta tables → live rows (LAKE columns + extras).

    ``policy`` (default LWW by max seq) picks the winning row per key
    across all inputs; a winning tombstone removes the key (compacted
    away — tombstones never reach the output)."""
    parts = [_as_delta(t) for t in tables if t is not None and t.num_rows]
    if not parts:
        return LAKE_SCHEMA.empty_table()
    target = unify_schemas(*[p.schema for p in parts])
    extras = _extra_fields(target)
    ordered = pa.schema([target.field(f.name) for f in _delta_schema_for(extras)])
    parts = [align_to_schema(p, ordered) for p in parts]
    t = (policy or lww_policy)(pa.concat_tables(parts))
    live = t.filter(pc.invert(pc.fill_null(t.column("deleted"), False))).drop_columns(
        ["deleted"]
    )
    # core columns pinned to LAKE types; enrichment columns keep theirs
    out_schema = pa.schema(
        [LAKE_SCHEMA.field(f.name) if f.name in LAKE_SCHEMA.names else f for f in live.schema]
    )
    return live.cast(out_schema)


def epoch_delta(changes: pa.Table, policy=None) -> pa.Table:
    """Changes → this epoch's delta file: policy resolution within the
    epoch only, winning tombstones RETAINED as ``deleted=True`` rows
    (merge-on-read needs them until compaction)."""
    return (policy or lww_policy)(_changes_to_delta(changes))


def lww_merge(prior: pa.Table | None, changes: pa.Table, policy=None) -> pa.Table:
    """Policy upsert (default LWW): prior lake rows + change rows → new
    lake rows.

    ``changes`` carries an ``op`` column; prior rows are treated as
    already-applied upserts.  Default winner per key = max seq; winning
    'D' deletes the key.  Output is LAKE-shaped (+ enrichment columns),
    sorted by (conv_id, turn_idx) for stable ordering and read locality.
    """
    tables = ([prior] if prior is not None else []) + [_changes_to_delta(changes)]
    return merge_deltas(tables, policy=policy)


def apply_merge_group(
    group: pa.Table,
    lake_dir: str,
    epoch: int,
    manifest_ref,
    mode: str = "cow",
    compact_threshold: int = 8,
    policy=None,
    max_attempts: int = 3,
    target_rows_per_file: int | None = None,
    staging_dir: str | None = None,
    auto_mor_ratio: float = 0.2,
) -> pa.Table:
    """Task-based entry point for ``groupby(__part).map_groups``.

    The manifest snapshot arrives as an ``ObjectRef`` (broadcast once by
    the driver via ``ray.put``); ``ray.get`` here is a zero-copy read
    from the local object store, not a re-ship per batch.
    """
    return MergeApplier(
        lake_dir,
        epoch,
        manifest_ref,
        mode,
        compact_threshold,
        policy,
        max_attempts,
        target_rows_per_file,
        staging_dir,
        auto_mor_ratio,
    )(group)


class MergeApplier:
    """Callable-class actor for ``groupby(__part).map_groups``.

    One instance per pool slot; the manifest snapshot is fetched from
    the object store once per actor (broadcast, not per batch) — setup
    in ``__init__``, work in ``__call__``, the actor-pool contract.

    Two write strategies per epoch:

    - ``cow`` (copy-on-write): read the partition's live rows, merge,
      rewrite the whole partition.  Read-optimal (one file), but write
      amplification grows with lake size — each epoch rewrites
      lake/P bytes per touched partition regardless of how few rows
      changed.
    - ``mor`` (merge-on-read): write ONLY this epoch's deduped delta
      (tombstones retained as ``deleted`` rows); readers resolve LWW
      across base+deltas.  When a partition accumulates
      ``compact_threshold`` files, this same task folds them into one
      base (automatic compaction) — the LSM/lakehouse pattern that
      keeps write amplification proportional to the CHANGE volume at
      10^10-event scale, not to lake size × epochs.
    """

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        manifest_ref,
        mode: str = "cow",
        compact_threshold: int = 8,
        policy=None,
        max_attempts: int = 3,
        target_rows_per_file: int | None = None,
        staging_dir: str | None = None,
        auto_mor_ratio: float = 0.2,
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.mode = mode
        self.auto_mor_ratio = auto_mor_ratio
        self.compact_threshold = compact_threshold
        self.policy = policy
        self.max_attempts = max_attempts
        self.target_rows_per_file = target_rows_per_file
        self.staging_dir = staging_dir
        man = manifest_ref
        if not isinstance(man, dict):
            man = ray.get(man)
        self.watermarks: dict[int, int] = man["watermarks"]
        self.part_files: dict[int, list[str]] = man["files"]
        self.part_rows: dict[int, int] = man.get("rows", {})

    # ------------------------------------------------------------------
    # Durable per-(epoch, partition) attempt counter — the per-attempt
    # lineage the reference records (``producer/PutKinesisStream.java:
    # 287-301,343-364``).  The marker is written ONLY on failure, so the
    # success path (the overwhelmingly common case at scale) costs zero
    # extra I/O; a crash/resume of the same epoch reads the last failed
    # attempt and continues the count.  Single writer per (epoch,
    # partition) by the groupby contract, so no lock is needed.
    def _attempt_path(self, part: int) -> str:
        return os.path.join(
            self.staging_dir, "attempts", f"epoch={self.epoch}", f"part-{part:05d}.attempt"
        )

    def _first_attempt(self, part: int) -> int:
        if not self.staging_dir:
            return 1
        try:
            with open(self._attempt_path(part)) as f:
                return int(f.read().strip() or 0) + 1
        except (OSError, ValueError):
            return 1

    def _record_failed_attempt(self, part: int, attempt: int) -> None:
        if not self.staging_dir:
            return
        path = self._attempt_path(part)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(attempt))
        os.replace(tmp, path)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part = int(group.column(PARTITION_COL)[0].as_py())
        group = group.drop_columns([PARTITION_COL])
        attempt = self._first_attempt(part)
        valid, rejected = split_rejects(group)

        n_rejected = rejected.num_rows

        out_files: list[str] = []
        if n_rejected:
            rel = f"rejected/epoch={self.epoch}/part-{part:05d}.parquet"
            self._write(rejected.sort_by("seq"), rel)
            out_files.append(rel)

        # Idempotent replay: never re-apply at/below the watermark.
        wm = self.watermarks.get(part, -1)
        if wm >= 0 and valid.num_rows:
            valid = valid.filter(pc.greater(valid.column("seq"), wm))

        # lineage provenance spans APPLIED seqs only (rejected/dropped
        # rows must not inflate the recorded applied range); null when
        # nothing applied.
        if valid.num_rows:
            seq_lo = pc.min(valid.column("seq")).as_py()
            seq_hi = pc.max(valid.column("seq")).as_py()
        else:
            seq_lo = seq_hi = None

        n_applied = valid.num_rows
        n_rows_after = 0
        error = None
        file_mode = None
        while n_applied:
            try:
                n_prior_files = len(self.part_files.get(part, []))
                use_mor = self.mode == "mor"
                delta = None
                if self.mode == "auto":
                    # per-partition change-ratio pick: delta-append only
                    # when this epoch changes a small FRACTION OF THE
                    # PARTITION — otherwise the delta costs nearly a
                    # rewrite in bytes but still adds a read-side file.
                    # Numerator: DISTINCT keys changed (delta rows), not
                    # applied events — an update-heavy stream (many
                    # events per key) would otherwise overstate the
                    # fraction by the events-per-key factor.
                    # Denominator: STORED rows.  Exact live keys after
                    # every COW/compaction fold; between folds, delta
                    # appends inflate it by superseded versions and
                    # tombstones (≤ compact_threshold × ratio relative
                    # drift, biasing auto toward MOR), and the next fold
                    # — forced at compact_threshold files — resets it
                    # to exact.  A live-key denominator would need the
                    # prior deltas read back, which is the exact cost
                    # MOR exists to skip.
                    prior_rows = self.part_rows.get(part, 0)
                    use_mor = False
                    if prior_rows > 0:
                        # one per-key reduce, shared by the numerator
                        # AND the delta write; the bulk/first epoch
                        # (no prior base) skips it entirely — COW is
                        # the only possible pick there
                        delta = epoch_delta(valid, policy=self.policy)
                        use_mor = delta.num_rows < prior_rows * self.auto_mor_ratio
                if use_mor and n_prior_files + 1 <= self.compact_threshold:
                    if delta is None:
                        # mode='mor': the delta reduce runs only once the
                        # file-count gate passes — a compaction epoch
                        # takes the COW fold below and must not pay (and
                        # discard) the per-key reduce first
                        delta = epoch_delta(valid, policy=self.policy)
                    # delta write: only this epoch's changes hit disk
                    n_rows_after = self.part_rows.get(part, 0) + delta.num_rows
                    rel = f"data/epoch={self.epoch}/part-{part:05d}.delta.parquet"
                    self._write(delta, rel)
                    out_files.append(rel)
                    file_mode = "append"
                else:
                    # cow rewrite — also the mor compaction fold
                    prior = self._read_prior(part)
                    if delta is not None and self.policy is None:
                        # auto picked COW after computing the ratio's
                        # per-key delta: fold the already-reduced delta
                        # instead of re-sorting the raw epoch.  Safe for
                        # the default LWW policy (associative — see the
                        # lww_policy contract above); an INJECTED policy
                        # takes the flat prior+raw-epoch path below so a
                        # cow pick under 'auto' stays byte-identical to
                        # merge_mode='cow' even for non-associative
                        # policies.
                        merged = merge_deltas([prior, delta], policy=None)
                    else:
                        merged = lww_merge(prior, valid, policy=self.policy)
                    n_rows_after = merged.num_rows
                    out_files.extend(self._write_data_split(merged, part))
                    file_mode = "replace"
                break
            except Exception as ex:
                # Failure routing by class (the reference's per-attempt
                # retry-then-dead-letter, producer/PutKinesisStream.java:
                # 287-301,329-333):
                # - Arrow decode/cast errors are DETERMINISTIC poison
                #   (bad data, corrupt prior file) — retrying is pointless,
                #   quarantine immediately.
                # - ENVIRONMENTAL faults (OSError: disk full, NFS blip)
                #   retry in-task with exponential backoff; if they outlast
                #   every attempt they PROPAGATE and fail the epoch — the
                #   2PC manifest makes the rerun exactly-once, so a sick
                #   environment can never become recorded data loss.  But
                #   a DETERMINISTIC OSError (typo'd path in an injected
                #   policy, truncated prior file raising ArrowIOError)
                #   would wedge the stream forever: the durable counter
                #   keeps growing across epoch reruns, so once attempts
                #   exceed 3× max_attempts (≥ 2 full rerun cycles of pure
                #   failure) the fault is treated as deterministic and
                #   quarantined like any other poison — loud in lineage,
                #   raw rows preserved, stream advances.
                # - Anything else (merge-kernel or injected-policy bugs)
                #   retries the same way, then dead-letters on the final
                #   attempt: a real bug fails K recorded times before
                #   quarantining WITH the raw rows preserved for replay.
                # The durable counter in _staging/attempts numbers every
                # attempt, including ones from a crashed prior process of
                # the same epoch.  (Worker deaths are still covered by
                # Ray's own task retry.)
                deterministic = isinstance(ex, (pa.ArrowInvalid, pa.ArrowNotImplementedError))
                environmental = isinstance(ex, OSError)
                self._record_failed_attempt(part, attempt)
                if not deterministic and attempt < self.max_attempts:
                    time.sleep(min(2.0, 0.05 * (2 ** (attempt - 1))))
                    attempt += 1
                    continue
                if environmental and attempt < 3 * self.max_attempts:
                    raise
                error = f"{type(ex).__name__}: {ex}"[:500]
                rel = f"deadletter/epoch={self.epoch}/part-{part:05d}.parquet"
                self._write(valid, rel)
                out_files = [f for f in out_files if not f.startswith("data/")]
                out_files.append(rel)
                n_applied = 0
                n_rows_after = 0
                file_mode = None

        wall_ms = int((time.perf_counter() - t0) * 1000)
        return pa.Table.from_pydict(
            {
                "partition": [part],
                "batch_id": [f"e{self.epoch}-p{part}"],
                "seq_lo": [seq_lo],
                "seq_hi": [seq_hi],
                "n_applied": [n_applied],
                "n_rejected": [n_rejected],
                "output_files": [out_files],
                "attempt": [attempt],
                "commit_epoch": [self.epoch],
                "wall_ms": [wall_ms],
                "error": [error],
                "file_mode": [file_mode],
            },
            schema=LINEAGE_SCHEMA,
        ).append_column("n_rows_after", pa.array([n_rows_after], pa.int64()))

    # ------------------------------------------------------------------
    def _read_prior(self, part: int) -> pa.Table | None:
        rels = self.part_files.get(part, [])
        if not rels:
            return None
        tables = [pq.read_table(os.path.join(self.lake_dir, r)) for r in rels]
        if len(tables) == 1:
            return tables[0]
        target = unify_schemas(*[t.schema for t in tables])
        return pa.concat_tables([align_to_schema(t, target) for t in tables])

    def _write(self, table: pa.Table, rel: str) -> None:
        path = os.path.join(self.lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(table, path)

    def _write_data_split(self, merged: pa.Table, part: int) -> list[str]:
        """COW rewrite, split at ``target_rows_per_file`` rows per file.

        Bounded files keep single-partition reads parallel and output
        resumable (never one giant file) — the aggregation-max-size
        analog (``producer/AbstractKinesisProducerProcessor.java:40-68``).
        Slicing is deterministic, so a retried task rewrites the same
        files at the same paths.
        """
        cap = self.target_rows_per_file
        if not cap or merged.num_rows <= cap:
            rel = f"data/epoch={self.epoch}/part-{part:05d}.parquet"
            self._write(merged, rel)
            return [rel]
        rels = []
        for i, lo in enumerate(range(0, merged.num_rows, cap)):
            rel = f"data/epoch={self.epoch}/part-{part:05d}-{i:04d}.parquet"
            self._write(merged.slice(lo, cap), rel)
            rels.append(rel)
        return rels
