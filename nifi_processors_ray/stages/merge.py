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


_MERGE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "seq", "op"]


def lww_merge(prior: pa.Table | None, changes: pa.Table) -> pa.Table:
    """Pure LWW upsert: prior lake rows + change rows → new lake rows.

    ``changes`` carries an ``op`` column; prior rows are treated as
    already-applied upserts.  Winner per key = max seq; winning 'D'
    deletes the key.  Output is LAKE_SCHEMA-shaped, sorted by
    (conv_id, turn_idx) for stable ordering and read locality.

    Single-threaded pyarrow kernels on purpose: this runs inside a
    merge-actor pool with one task per CPU slot — a per-task parallel
    runtime (polars' global thread pool) would oversubscribe the node
    (measured: 50-70ms/group alone → seconds/group under 16-way actor
    contention; 14ms/group this way).
    """
    t = align_to_schema(changes, CHANGELOG_SCHEMA).select(_MERGE_COLS)
    if prior is not None and prior.num_rows:
        target = unify_schemas(LAKE_SCHEMA, prior.schema)
        p = align_to_schema(prior, target).select(_MERGE_COLS[:-1])
        p = p.append_column("op", pa.repeat(pa.scalar("I"), p.num_rows))
        t = pa.concat_tables([p, t], promote_options="permissive")
    # Sort so the LWW winner of each (conv_id, turn_idx) group is the
    # group's last row (max seq; prior rows carry their applied seq).
    idx = pc.sort_indices(
        t,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"), ("seq", "ascending")],
    )
    t = t.take(idx).combine_chunks()
    n = t.num_rows
    if n == 0:
        return LAKE_SCHEMA.empty_table()
    conv, turn = t.column("conv_id"), t.column("turn_idx")
    if n > 1:
        same_next = pc.and_(
            pc.equal(conv.slice(0, n - 1), conv.slice(1)),
            pc.equal(turn.slice(0, n - 1), turn.slice(1)),
        ).combine_chunks()
        not_last = pa.chunked_array([same_next, pa.array([False])])
    else:
        not_last = pa.chunked_array([pa.array([False])])
    mask = pc.and_(
        pc.invert(pc.fill_null(not_last, False)),
        pc.not_equal(t.column("op"), "D"),
    )
    return t.filter(mask).drop_columns(["op"]).cast(LAKE_SCHEMA)


def apply_merge_group(group: pa.Table, lake_dir: str, epoch: int, manifest_ref) -> pa.Table:
    """Task-based entry point for ``groupby(__part).map_groups``.

    The manifest snapshot arrives as an ``ObjectRef`` (broadcast once by
    the driver via ``ray.put``); ``ray.get`` here is a zero-copy read
    from the local object store, not a re-ship per batch.
    """
    return MergeApplier(lake_dir, epoch, manifest_ref)(group)


class MergeApplier:
    """Callable-class actor for ``groupby(__part).map_groups``.

    One instance per pool slot; the manifest snapshot is fetched from
    the object store once per actor (broadcast, not per batch) — setup
    in ``__init__``, work in ``__call__``, the actor-pool contract.
    """

    def __init__(self, lake_dir: str, epoch: int, manifest_ref):
        self.lake_dir = lake_dir
        self.epoch = epoch
        man = manifest_ref
        if not isinstance(man, dict):
            man = ray.get(man)
        self.watermarks: dict[int, int] = man["watermarks"]
        self.part_files: dict[int, list[str]] = man["files"]

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part = int(group.column(PARTITION_COL)[0].as_py())
        group = group.drop_columns([PARTITION_COL])
        valid, rejected = split_rejects(group)

        n_rejected = rejected.num_rows
        seqs = group.column("seq")
        seq_lo = pc.min(seqs).as_py()
        seq_hi = pc.max(seqs).as_py()

        out_files: list[str] = []
        if n_rejected:
            rel = f"rejected/epoch={self.epoch}/part-{part:05d}.parquet"
            self._write(rejected.sort_by("seq"), rel)
            out_files.append(rel)

        # Idempotent replay: never re-apply at/below the watermark.
        wm = self.watermarks.get(part, -1)
        if wm >= 0 and valid.num_rows:
            valid = valid.filter(pc.greater(valid.column("seq"), wm))

        n_applied = valid.num_rows
        n_rows_after = 0
        error = None
        if n_applied:
            try:
                prior = self._read_prior(part)
                merged = lww_merge(prior, valid)
                n_rows_after = merged.num_rows
                rel = f"data/epoch={self.epoch}/part-{part:05d}.parquet"
                self._write(merged, rel)
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
