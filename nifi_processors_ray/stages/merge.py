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


def _changes_to_delta(changes: pa.Table) -> pa.Table:
    """CHANGELOG rows → DELTA rows (op column → deleted flag)."""
    t = align_to_schema(changes, CHANGELOG_SCHEMA)
    deleted = pc.fill_null(pc.equal(t.column("op"), "D"), False)
    out = t.select([f.name for f in LAKE_SCHEMA])
    return out.append_column("deleted", deleted).cast(DELTA_SCHEMA)


def _as_delta(table: pa.Table) -> pa.Table:
    """LAKE- or DELTA-shaped (possibly schema-drifted) table → DELTA."""
    target = unify_schemas(DELTA_SCHEMA, table.schema)
    t = align_to_schema(table, target).select([f.name for f in DELTA_SCHEMA])
    return t.set_column(
        t.schema.get_field_index("deleted"),
        "deleted",
        pc.fill_null(t.column("deleted"), False),
    ).cast(DELTA_SCHEMA)


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


def merge_deltas(tables: list[pa.Table]) -> pa.Table:
    """Resolve base + delta tables → live rows (LAKE_SCHEMA).

    LWW per key by max seq across all inputs; a winning tombstone
    removes the key (compacted away — tombstones never reach the
    output)."""
    parts = [_as_delta(t) for t in tables if t is not None and t.num_rows]
    if not parts:
        return LAKE_SCHEMA.empty_table()
    t = _last_per_key(pa.concat_tables(parts))
    return (
        t.filter(pc.invert(t.column("deleted")))
        .drop_columns(["deleted"])
        .cast(LAKE_SCHEMA)
    )


def epoch_delta(changes: pa.Table) -> pa.Table:
    """Changes → this epoch's delta file: LWW within the epoch only,
    winning tombstones RETAINED as ``deleted=True`` rows (merge-on-read
    needs them until compaction)."""
    return _last_per_key(_changes_to_delta(changes)).cast(DELTA_SCHEMA)


def lww_merge(prior: pa.Table | None, changes: pa.Table) -> pa.Table:
    """Pure LWW upsert: prior lake rows + change rows → new lake rows.

    ``changes`` carries an ``op`` column; prior rows are treated as
    already-applied upserts.  Winner per key = max seq; winning 'D'
    deletes the key.  Output is LAKE_SCHEMA-shaped, sorted by
    (conv_id, turn_idx) for stable ordering and read locality.
    """
    tables = ([prior] if prior is not None else []) + [_changes_to_delta(changes)]
    return merge_deltas(tables)


def apply_merge_group(
    group: pa.Table,
    lake_dir: str,
    epoch: int,
    manifest_ref,
    mode: str = "cow",
    compact_threshold: int = 8,
) -> pa.Table:
    """Task-based entry point for ``groupby(__part).map_groups``.

    The manifest snapshot arrives as an ``ObjectRef`` (broadcast once by
    the driver via ``ray.put``); ``ray.get`` here is a zero-copy read
    from the local object store, not a re-ship per batch.
    """
    return MergeApplier(lake_dir, epoch, manifest_ref, mode, compact_threshold)(group)


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
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.mode = mode
        self.compact_threshold = compact_threshold
        man = manifest_ref
        if not isinstance(man, dict):
            man = ray.get(man)
        self.watermarks: dict[int, int] = man["watermarks"]
        self.part_files: dict[int, list[str]] = man["files"]
        self.part_rows: dict[int, int] = man.get("rows", {})

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part = int(group.column(PARTITION_COL)[0].as_py())
        group = group.drop_columns([PARTITION_COL])
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
        if n_applied:
            try:
                n_prior_files = len(self.part_files.get(part, []))
                if self.mode == "mor" and n_prior_files + 1 <= self.compact_threshold:
                    # delta write: only this epoch's changes hit disk
                    delta = epoch_delta(valid)
                    n_rows_after = self.part_rows.get(part, 0) + delta.num_rows
                    rel = f"data/epoch={self.epoch}/part-{part:05d}.delta.parquet"
                    self._write(delta, rel)
                    file_mode = "append"
                else:
                    # cow rewrite — also the mor compaction fold
                    prior = self._read_prior(part)
                    merged = lww_merge(prior, valid)
                    n_rows_after = merged.num_rows
                    rel = f"data/epoch={self.epoch}/part-{part:05d}.parquet"
                    self._write(merged, rel)
                    file_mode = "replace"
                out_files.append(rel)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError, KeyError, TypeError) as ex:
                # DETERMINISTIC failure (poison data, corrupt prior file):
                # retrying is pointless — quarantine the batch instead of
                # failing the epoch.  The raw rows go to the dead-letter
                # area, the error lands in lineage, the watermark still
                # advances (explicitly recorded loss, not a stuck stream).
                # Transient errors (OSError etc.) are NOT caught: they
                # propagate so Ray's task retry handles them — the
                # "retry-then-dead-letter" split of the reference's
                # per-attempt routing (producer/PutKinesisStream.java:
                # 287-301,329-333) by failure class.
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
                "attempt": [1],
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
