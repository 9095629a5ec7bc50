"""CDC replay driver: tail → validate → partition → merge → commit.

The Ray-Data-native restatement of the reference's ingest path
(SURVEY.md §3.1/§3.4).  One epoch = one seq window of the change log
run through ONE streaming Dataset pipeline with exactly ONE shuffle
(the hash partition before the merge), ending in a two-phase commit:

    read_window(wm, hi]                       # offset-pruned parquet scan
      .map_batches(validate_batch)            # stateless, zero-copy Arrow
      .map_batches(add_partition_column)      # salted hash partitioner
      .groupby(__part).map_groups(MergeApplier, ...)   # actor-pool COW merge
      → lineage rows (tiny) → driver writes lineage parquet
      → ManifestStore.commit(manifest)        # atomic rename = the commit point

Crash anywhere before the manifest rename → the epoch never happened
(staged files are overwritten on retry at the same deterministic
paths); crash after → the epoch is fully visible.  That single atomic
point is the exactly-once upgrade over the reference's
checkpoint-then-commit gap (``consumer/GetKinesisStream.java:283-295``).

FAILOVER MODEL (deliberate divergence from the reference): the
reference scales out via KCL's lease table — many workers each lease
shards, and a dead worker's leases MIGRATE to the survivors
(``consumer/AbstractKinesisConsumerProcessor.java:97-104``).  This
engine is single-writer by design, like every manifest-committed lake
(Delta/Iceberg): parallelism lives INSIDE the epoch (hundreds of merge
tasks, Ray retries cover worker death transparently), and the one
driver is the only lease.  Driver death is handled by RESTART, not
lease migration — the 2PC manifest makes the restarted replay resume
from the last committed epoch exactly-once (pinned by
``tests/test_crash_stress.py``), so failover is "run the job again"
(`ray job submit` with restarts, or any supervisor).  The flock in
``ManifestStore.writer_lock`` enforces the contract on one host;
cross-host mutual exclusion is the scheduler's job (one driver per
lake), because flock over NFS/object stores is unreliable.

NOTE: never calls ``ray.init``/``ray.shutdown`` — the session is owned
by the caller (driver contract).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import EngineConfig
from ..functions.hashing import engine_hash_fingerprint
from ..schema import LINEAGE_SCHEMA, REJECTED_SCHEMA
from ..sources import tailer
from ..stages.merge import (
    LAKE_SCHEMA,
    TRANSCRIPT_COLS,
    MergeApplier,
    apply_merge_group,
    merge_deltas,
)
from ..stages.partition import PARTITION_COL, add_partition_column
from ..stages.validate import validate_batch
from ..state.manifest import Manifest, ManifestStore


def _compact_partition_task(
    batch: pa.Table, lake_dir: str, epoch: int, policy, cap
) -> pa.Table:
    """Fold ONE partition's base+delta files into fresh COW files under
    ``epoch`` (one distributed task per partition; deterministic paths,
    so a retried task rewrites the same files).  Returns a receipt row
    per partition; the driver swaps references in one manifest commit."""
    out_p, out_rels, out_rows = [], [], []
    for i in range(batch.num_rows):
        part = int(batch.column("part")[i].as_py())
        rels = batch.column("rels")[i].as_py()
        tables = [pq.read_table(os.path.join(lake_dir, f)) for f in rels]
        merged = merge_deltas(tables, policy=policy)
        new_rels = []
        if merged.num_rows:
            slices = (
                [(0, merged.num_rows)]
                if not cap or merged.num_rows <= cap
                else [(lo, cap) for lo in range(0, merged.num_rows, cap)]
            )
            for k, (lo, ln) in enumerate(slices):
                suffix = "" if len(slices) == 1 else f"-{k:04d}"
                rel = f"data/epoch={epoch}/part-{part:05d}{suffix}.parquet"
                path = os.path.join(lake_dir, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                pq.write_table(merged.slice(lo, ln), path)
                new_rels.append(rel)
        out_p.append(part)
        out_rels.append(new_rels)
        out_rows.append(merged.num_rows)
    return pa.table(
        {
            "part": pa.array(out_p, pa.int32()),
            "rels": pa.array(out_rels, pa.list_(pa.string())),
            "rows": pa.array(out_rows, pa.int64()),
        }
    )


def _diff_sides(old: pa.Table, new: pa.Table) -> pa.Table:
    """Classify key-level differences between two resolved partition
    states: 'added' (key only in new), 'deleted' (only in old),
    'updated' (payload differs under IS DISTINCT FROM null semantics).
    Unchanged keys emit nothing.

    Shape: tag sides, one in-memory sort by (conv_id, turn_idx, side),
    then run analysis — (conv_id, turn_idx) is unique within a side, so
    every key run has length 1 (one-sided) or 2 (paired old,new)."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "change_kind": pa.array([], pa.string()),
        }
    )

    def pad(t: pa.Table, side: int) -> pa.Table:
        for c in cols:  # pre-evolution snapshots may predate `tool`
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, LAKE_SCHEMA.field(c).type))
        t = t.select(cols)
        return t.append_column("side", pa.array(np.full(t.num_rows, side, np.int8)))

    t = pa.concat_tables([pad(old, 0), pad(new, 1)]).combine_chunks()
    if t.num_rows == 0:
        return empty
    t = t.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("side", "ascending")]
    )
    conv = np.asarray(t.column("conv_id").combine_chunks().dictionary_encode().indices)
    turn = np.asarray(t.column("turn_idx"))
    side = np.asarray(t.column("side"))
    new_key = np.concatenate([[True], (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1])])
    starts = np.nonzero(new_key)[0]
    lens = np.diff(np.append(starts, len(conv)))
    if (lens > 2).any():
        raise RuntimeError(
            "state_diff: a (conv_id, turn_idx) key resolved to multiple rows "
            "within one snapshot — lake invariant violated"
        )
    solo = starts[lens == 1]
    pair_a = starts[lens == 2]  # old row; new row is pair_a + 1

    def distinct(col, a_idx, b_idx):  # IS DISTINCT FROM, vectorized
        arr = t.column(col).combine_chunks()
        a, b = arr.take(pa.array(a_idx)), arr.take(pa.array(b_idx))
        eq = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        return ~(np.asarray(eq) | np.asarray(both_null))

    changed = np.zeros(len(pair_a), dtype=bool)
    for c in cols[2:]:
        changed |= distinct(c, pair_a, pair_a + 1)
    out_idx = np.concatenate([solo, pair_a[changed]])
    kinds = np.concatenate(
        [
            np.where(side[solo] == 0, "deleted", "added"),
            np.full(int(changed.sum()), "updated"),
        ]
    )
    order = np.argsort(out_idx, kind="stable")
    take = pa.array(out_idx[order])
    return pa.table(
        {
            "conv_id": t.column("conv_id").take(take),
            "turn_idx": t.column("turn_idx").take(take),
            "change_kind": pa.array(kinds[order].astype(object), pa.string()),
        }
    )


def _diff_partition(batch: pa.Table, policy=None) -> pa.Table:
    """One task per partition: resolve the OLD and NEW snapshots' file
    sets for the same partition locally and diff them — both snapshots
    share the lake's partitioner, so the diff never shuffles."""
    outs = []
    for row in batch.to_pylist():
        old_tables = [pq.read_table(p) for p in row["paths_old"]]
        new_tables = [pq.read_table(p) for p in row["paths_new"]]
        old = (
            merge_deltas(old_tables, policy=policy).drop_columns(["seq"])
            if old_tables
            else LAKE_SCHEMA.empty_table().select(TRANSCRIPT_COLS)
        )
        new = (
            merge_deltas(new_tables, policy=policy).drop_columns(["seq"])
            if new_tables
            else LAKE_SCHEMA.empty_table().select(TRANSCRIPT_COLS)
        )
        outs.append(_diff_sides(old, new))
    if not outs:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "change_kind": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(outs)


def _resolve_partition(batch: pa.Table, policy=None, filters=None) -> pa.Table:
    """Read + policy-resolve (default LWW) one or a few partitions' file
    sets.  All columns except the internal ``seq`` survive — including
    enrichment columns injected by the ``enrich`` hook.

    ``filters`` (pyarrow read filters) may restrict the read to a KEY
    subset — safe for LWW resolution because every version of a key
    lives in this partition's files, so a key-level filter never hides
    a newer version from the resolve (used by point lookups to prune
    row groups instead of filtering after the merge)."""
    outs = []
    for row in batch.column("paths").to_pylist():
        tables = [pq.read_table(p, filters=filters) for p in row]
        outs.append(merge_deltas(tables, policy=policy).drop_columns(["seq"]))
    if not outs:
        return LAKE_SCHEMA.empty_table().select(TRANSCRIPT_COLS)
    return pa.concat_tables(outs, promote_options="permissive")


# Envelope columns the enrich hook must preserve (partition/merge/lineage
# all key off them); payload columns may be added or rewritten freely.
_ENRICH_REQUIRED = ("seq", "op", "conv_id", "turn_idx", "batch_id", "reject_reason")


def _apply_enrich(batch: pa.Table, fn) -> pa.Table:
    """Run the injected per-batch enrich callable (the RecordsHandler
    seam, ``consumer/RecordsHandler.java:29-52``) and enforce its
    contract: the changelog envelope must survive."""
    out = fn(batch)
    if not isinstance(out, pa.Table):
        raise TypeError(f"enrich must return a pyarrow.Table, got {type(out).__name__}")
    missing = [c for c in _ENRICH_REQUIRED if c not in out.column_names]
    if missing:
        raise RuntimeError(
            f"enrich hook dropped required changelog columns {missing}; "
            "it may add or modify payload columns only"
        )
    return out


# Changefeed output: the winning change event per key, envelope order.
_CHANGEFEED_COLS = ("conv_id", "turn_idx", "op", "role", "text", "tool", "ts", "seq")


def _changefeed_empty() -> pa.Table:
    from ..schema import CHANGELOG_SCHEMA

    return CHANGELOG_SCHEMA.empty_table().select(list(_CHANGEFEED_COLS))


def _changefeed_latest(batch: pa.Table) -> pa.Table:
    """Keep each (conv_id, turn_idx) key's locally-latest event (max
    seq).  Rows here are VALID changelog rows, so conv_id/turn_idx are
    never null and the run detection below never sees a null key."""
    import numpy as np

    if batch.num_rows == 0:
        return _changefeed_empty()
    b = batch.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("seq", "descending")]
    )
    conv = np.asarray(b.column("conv_id").combine_chunks().dictionary_encode().indices)
    turn = np.asarray(b.column("turn_idx"))
    first = np.concatenate([[True], (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1])])
    return b.filter(pa.array(first))


def _changefeed_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the changefeed: validity filter + local
    latest-per-key, so the sort exchange moves ≤1 row per key per batch."""
    import pyarrow.compute as pc

    batch = batch.filter(pc.is_null(batch.column("reject_reason")))
    return _changefeed_latest(batch.select(list(_CHANGEFEED_COLS)))


@dataclass
class EpochResult:
    epoch: int
    seq_lo: int
    seq_hi: int
    n_applied: int
    n_rejected: int
    partitions_touched: int


class CdcEngine:
    def __init__(self, config: EngineConfig):
        self.cfg = config
        self.store = ManifestStore(config.manifest_dir)
        self._infos: list[tailer.LogFileInfo] | None = None
        self._scan_cache: dict[str, tuple[tuple[int, int], tailer.LogFileInfo]] = {}

    # ------------------------------------------------------------------
    def log_infos(self, refresh: bool = False) -> list[tailer.LogFileInfo]:
        """Footer metadata for every log file, with an mtime/size cache.

        A committed log segment never changes, so a refresh (each follow
        poll) re-scans only NEW or modified files — O(new files) footer
        reads per poll instead of O(all files) on a long-retained log.
        """
        if self._infos is None or refresh:
            files = tailer.discover_log_files(self.cfg.changelog_paths)
            fresh: list[tailer.LogFileInfo] = []
            to_scan: list[str] = []
            for p in files:
                try:
                    st = os.stat(p)
                    key = (st.st_mtime_ns, st.st_size)
                except OSError:
                    key = None
                cached = self._scan_cache.get(p)
                if cached is not None and key is not None and cached[0] == key:
                    fresh.append(cached[1])
                else:
                    to_scan.append(p)
            for info in tailer.scan_log(to_scan):
                try:
                    st = os.stat(info.path)
                    self._scan_cache[info.path] = ((st.st_mtime_ns, st.st_size), info)
                except OSError:
                    pass
                fresh.append(info)
            fresh.sort(key=lambda i: i.path)
            self._infos = fresh
        return self._infos

    def current_manifest(self) -> Manifest:
        man = self.store.latest()
        if man is None:
            from ..config import LATEST

            wm0 = tailer.head_seq(self.log_infos()) if self.cfg.initial_position == LATEST else -1
            man = Manifest(
                epoch=0,
                num_partitions=self.cfg.num_partitions,
                salt_factor=self.cfg.salt_factor,
                hash_fingerprint=engine_hash_fingerprint(),
                watermarks={p: wm0 for p in range(self.cfg.num_partitions)},
            )
            # Persist epoch 0 immediately: the start position (esp. LATEST's
            # head pin) is decided ONCE at first start — otherwise a
            # caught-up run that commits nothing would re-evaluate LATEST
            # against a newer head and silently skip events.
            self.store.commit(man)
        else:
            if man.hash_fingerprint != engine_hash_fingerprint():
                raise RuntimeError(
                    "hash implementation drifted since this lake was written; "
                    "refusing to resume (keys would land in wrong partitions): "
                    f"{man.hash_fingerprint} != {engine_hash_fingerprint()}"
                )
            if man.num_partitions != self.cfg.num_partitions or man.salt_factor != self.cfg.salt_factor:
                raise RuntimeError(
                    "num_partitions/salt_factor differ from the committed lake's; "
                    "partition placement is a pure function of these — "
                    "use the manifest's values or rebuild the lake"
                )
        return man

    # ------------------------------------------------------------------
    def run_epoch(self, man: Manifest | None = None) -> EpochResult | None:
        """Process the next seq window; returns None when caught up.

        Holds the lake's writer lock for the whole epoch: a second
        concurrent writer would race the same deterministic output paths
        and clobber this epoch's commit (single-writer contract)."""
        with self.store.writer_lock():
            return self._run_epoch_locked(man)

    def _run_epoch_locked(self, man: Manifest | None) -> EpochResult | None:
        man = man or self.current_manifest()
        infos = self.log_infos()
        head = tailer.head_seq(infos)
        wm = man.min_watermark
        if wm >= head:
            return None
        hi = min(wm + self.cfg.epoch_events, head)
        epoch = man.epoch + 1

        ds = tailer.read_window(infos, wm, hi, num_blocks=self._read_num_blocks())
        if ds is None:
            # hole in the log (nothing in window) — just advance watermarks
            self._commit(man, epoch, hi, [])
            return EpochResult(epoch, wm + 1, hi, 0, 0, 0)

        P, S = self.cfg.num_partitions, self.cfg.salt_factor
        ds = ds.map_batches(validate_batch, batch_format="pyarrow", batch_size=self.cfg.batch_size)
        if self.cfg.enrich is not None:
            # user-extension seam: injected parse/enrich stage between
            # validate and partition (RecordsHandler analog)
            ds = ds.map_batches(
                _apply_enrich, batch_format="pyarrow", fn_kwargs={"fn": self.cfg.enrich}
            )
        ds = ds.map_batches(
            add_partition_column,
            batch_format="pyarrow",
            fn_kwargs={"num_partitions": P, "salt_factor": S},
        )

        # The manifest snapshot is broadcast ONCE via the object store and
        # fetched zero-copy by every merge task (never re-shipped per batch).
        manifest_ref = ray.put(
            {"watermarks": man.watermarks, "files": man.files, "rows": man.rows}
        )
        fn_kwargs = {
            "lake_dir": self.cfg.lake_dir,
            "epoch": epoch,
            "manifest_ref": manifest_ref,
            "mode": self.cfg.merge_mode,
            "auto_mor_ratio": self.cfg.auto_mor_ratio,
            "compact_threshold": self.cfg.compact_threshold,
            "policy": self.cfg.merge_policy,
            "max_attempts": self.cfg.max_attempts,
            "target_rows_per_file": self.cfg.target_rows_per_file,
            "staging_dir": self.cfg.staging_dir,
        }
        grouped = ds.groupby(PARTITION_COL)
        if self.cfg.merge_concurrency:
            # Optional actor-pool mode (per-slot setup amortized across groups).
            lineage_ds = grouped.map_groups(
                MergeApplier,
                batch_format="pyarrow",
                concurrency=self.cfg.merge_concurrency,
                fn_constructor_kwargs=fn_kwargs,
            )
        else:
            # Default: plain tasks.  The merge "state" is (a) the immutable
            # broadcast manifest snapshot and (b) the lake files on disk —
            # there is no mutable in-process state to pin to an actor, and
            # task-based map_groups avoids the actor-pool's per-run startup
            # cost entirely (measured 3-4× faster end-to-end at 2M events).
            lineage_ds = grouped.map_groups(
                apply_merge_group, batch_format="pyarrow", fn_kwargs=fn_kwargs
            )
        rows = lineage_ds.take_all()  # ≤ P rows — tiny
        self._commit(man, epoch, hi, rows)
        return EpochResult(
            epoch=epoch,
            seq_lo=wm + 1,
            seq_hi=hi,
            n_applied=sum(r["n_applied"] for r in rows),
            n_rejected=sum(r["n_rejected"] for r in rows),
            partitions_touched=sum(1 for r in rows if r["n_applied"] > 0),
        )

    def bootstrap(self, snapshot_paths, as_of_seq: int) -> EpochResult:
        """Two-phase ingest, phase one: load an initial SNAPSHOT of the
        table (plain transcript rows, no envelope) as the lake's first
        epoch, then tail the change log from ``as_of_seq`` — the
        standard bulk-load-then-CDC bootstrap (a fresh consumer can't
        afford to replay a years-long log from TRIM_HORIZON).

        The snapshot flows through the SAME validate → salted partition
        → merge → 2PC pipeline as change batches (wrapped as op='I'
        events at ``seq = as_of_seq``), so every invariant — rejected
        routing, schema unification, exactly-once commit — holds for
        the bulk phase too.  Later tail events (seq > as_of_seq) win
        LWW over snapshot rows by the ordinary seq rule.  Only legal on
        an empty lake; crash-safe like any epoch (no manifest → the
        bootstrap never happened; rerun is idempotent).
        """
        with self.store.writer_lock():
            man = self.current_manifest()
            if man.epoch != 0 or any(man.files.values()):
                raise RuntimeError(
                    "bootstrap requires an empty lake (no committed epochs); "
                    f"this lake is at epoch {man.epoch}"
                )
            if man.min_watermark >= as_of_seq:
                raise RuntimeError(
                    "bootstrap snapshot seq is behind the lake's start position "
                    f"({as_of_seq} <= watermark {man.min_watermark}); a LATEST-"
                    "positioned lake cannot be bootstrapped from an older snapshot"
                )
            ds = ray.data.read_parquet(snapshot_paths)

            import numpy as np

            def to_changelog(b: pa.Table) -> pa.Table:
                n = b.num_rows
                b = b.append_column("seq", pa.array(np.full(n, as_of_seq), pa.int64()))
                b = b.append_column("op", pa.repeat(pa.scalar("I", pa.string()), n))
                return b.append_column(
                    "batch_id", pa.repeat(pa.scalar("bootstrap", pa.string()), n)
                )

            P, S = self.cfg.num_partitions, self.cfg.salt_factor
            ds = ds.map_batches(to_changelog, batch_format="pyarrow")
            ds = ds.map_batches(
                validate_batch, batch_format="pyarrow", batch_size=self.cfg.batch_size
            )
            ds = ds.map_batches(
                add_partition_column,
                batch_format="pyarrow",
                fn_kwargs={"num_partitions": P, "salt_factor": S},
            )
            manifest_ref = ray.put(
                {"watermarks": man.watermarks, "files": man.files, "rows": man.rows}
            )
            fn_kwargs = {
                "lake_dir": self.cfg.lake_dir,
                "epoch": 1,
                "manifest_ref": manifest_ref,
                "mode": self.cfg.merge_mode,
                "auto_mor_ratio": self.cfg.auto_mor_ratio,
                "compact_threshold": self.cfg.compact_threshold,
                "policy": self.cfg.merge_policy,
                "max_attempts": self.cfg.max_attempts,
                "target_rows_per_file": self.cfg.target_rows_per_file,
                "staging_dir": self.cfg.staging_dir,
            }
            rows = (
                ds.groupby(PARTITION_COL)
                .map_groups(apply_merge_group, batch_format="pyarrow", fn_kwargs=fn_kwargs)
                .take_all()
            )
            # the commit pins every watermark to as_of_seq: the tail
            # resumes at (as_of_seq, head] — events the snapshot already
            # reflects are never re-applied
            self._commit(man, 1, as_of_seq, rows)
            return EpochResult(
                epoch=1,
                seq_lo=as_of_seq,
                seq_hi=as_of_seq,
                n_applied=sum(r["n_applied"] for r in rows),
                n_rejected=sum(r["n_rejected"] for r in rows),
                partitions_touched=sum(1 for r in rows if r["n_applied"] > 0),
            )

    def reprocess_deadletters(self) -> EpochResult | None:
        """Re-drive quarantined rows through the merge — the reference's
        failure-relationship re-queue (a NiFi operator routes the failure
        queue back into the processor after fixing the fault; here the
        quarantine directory IS that queue).

        Correctness contract:
        - quarantined rows keep their ORIGINAL seq, and the merge resolves
          by seq (LWW), so re-applying an old change can never clobber a
          newer applied update for the same (conv_id, turn_idx);
        - the watermark filter is bypassed (an empty watermark map rides
          the broadcast manifest) — quarantined seqs sit at/below the
          global watermark by construction, the normal path would drop
          them silently;
        - the commit atomically removes the reprocessed quarantine files
          from the manifest; rows that fail AGAIN re-quarantine under
          this epoch's paths (nothing is ever lost, only moved);
        - runs as a normal 2PC epoch under the writer lock: a crash
          before commit leaves the old manifest (rerun is idempotent);
          watermarks are preserved, so the tail resumes exactly where it
          was.

        Returns None when the quarantine is empty.
        """
        with self.store.writer_lock():
            man = self.current_manifest()
            old_rels = list(man.deadletter_files)
            if not old_rels:
                return None
            epoch = man.epoch + 1
            paths = [os.path.join(self.cfg.lake_dir, r) for r in old_rels]
            P, S = self.cfg.num_partitions, self.cfg.salt_factor

            def requeue(b: pa.Table) -> pa.Table:
                # quarantined rows are the post-validate VALID rows; the
                # merge's split_rejects expects the (all-null here)
                # reject_reason marker back
                return b.append_column(
                    "reject_reason", pa.nulls(b.num_rows, pa.string())
                )

            # columns pinned from the footers (keeps enrichment columns,
            # excludes the hive-inferred epoch=N path segment)
            names: list[str] = []
            for p in paths:
                for n in pq.read_schema(p).names:
                    if n not in names:
                        names.append(n)
            ds = (
                ray.data.read_parquet(paths, columns=names)
                .map_batches(requeue, batch_format="pyarrow")
                .map_batches(
                    add_partition_column,
                    batch_format="pyarrow",
                    fn_kwargs={"num_partitions": P, "salt_factor": S},
                )
            )
            # empty watermark map = no seq floor (see contract above)
            manifest_ref = ray.put({"watermarks": {}, "files": man.files, "rows": man.rows})
            fn_kwargs = {
                "lake_dir": self.cfg.lake_dir,
                "epoch": epoch,
                "manifest_ref": manifest_ref,
                "mode": self.cfg.merge_mode,
                "auto_mor_ratio": self.cfg.auto_mor_ratio,
                "compact_threshold": self.cfg.compact_threshold,
                "policy": self.cfg.merge_policy,
                "max_attempts": self.cfg.max_attempts,
                "target_rows_per_file": self.cfg.target_rows_per_file,
                "staging_dir": self.cfg.staging_dir,
            }
            rows = (
                ds.groupby(PARTITION_COL)
                .map_groups(apply_merge_group, batch_format="pyarrow", fn_kwargs=fn_kwargs)
                .take_all()
            )
            self._commit(
                man, epoch, man.min_watermark, rows, clear_deadletters=old_rels
            )
            return EpochResult(
                epoch=epoch,
                seq_lo=man.min_watermark,
                seq_hi=man.min_watermark,
                n_applied=sum(r["n_applied"] for r in rows),
                n_rejected=sum(r["n_rejected"] for r in rows),
                partitions_touched=sum(1 for r in rows if r["n_applied"] > 0),
            )

    def forget_conversations(self, conv_ids) -> EpochResult | None:
        """Targeted erasure (the right-to-be-forgotten lifecycle op):
        synthesize an ``op='D'`` tombstone for EVERY live (conv_id,
        turn_idx) key of the given conversations and drive them through
        the ORDINARY validate → salted partition → merge → 2PC pipeline
        as a new epoch — erasure is just another commit, with all the
        exactly-once / crash-safety invariants (a crash before the
        manifest rename means the erasure never happened; rerun is
        idempotent because the keys are re-enumerated from live state).

        Key enumeration is partition-pruned per conversation (the
        salted-hash layout is the index), so the cost scales with the
        conversations being erased, not the lake.

        Seq semantics (standard CDC, consistent under COW and MOR):
        tombstones carry ``seq = max(watermark) + 1`` — the first
        UNCONSUMED seq, because the merge's at-most-once guard drops
        rows at or below the watermark — while the commit leaves the
        stream watermarks UNTOUCHED, so no future log event is ever
        skipped (the tail resumes exactly where it was; round-3 review
        finding).  Erasure removes everything applied SO FAR; a later
        stream event for an erased key legitimately re-creates that row,
        exactly as a Delta/Iceberg DELETE followed by an INSERT would —
        callers wanting permanence re-run forget or filter the producer.
        The corner where the producer's next real event lands on the
        tombstone's exact seq resolves deterministically to the REAL
        event: it arrives in a later epoch, later inputs concatenate
        after prior state, and the LWW policy's stable sort keeps the
        last input row on seq ties.  Under merge-on-read the tombstones
        persist in deltas until compaction; ``vacuum()`` after
        :meth:`expire_snapshots` makes the text physically
        unrecoverable.

        Returns the erasure epoch's result, or ``None`` when none of the
        conversations have live rows (nothing to erase, no commit).
        """
        import numpy as np

        with self.store.writer_lock():
            man = self.current_manifest()
            if man is None or not any(man.files.values()):
                return None
            convs, turns = [], []
            for cid in sorted(set(conv_ids)):
                rows = (
                    self.read_conversation(cid)
                    .select_columns(["conv_id", "turn_idx"])
                    .take_all()
                )
                convs.extend(r["conv_id"] for r in rows)
                turns.extend(r["turn_idx"] for r in rows)
            if not convs:
                return None
            erase_seq = max(man.watermarks.values()) + 1
            n = len(convs)
            batch = pa.table(
                {
                    "op": pa.repeat(pa.scalar("D", pa.string()), n),
                    "conv_id": pa.array(convs, pa.string()),
                    "turn_idx": pa.array(turns, pa.int32()),
                    "seq": pa.array(np.full(n, erase_seq), pa.int64()),
                    "batch_id": pa.repeat(pa.scalar("forget", pa.string()), n),
                }
            )
            epoch = man.epoch + 1
            ds = ray.data.from_arrow(batch)
            ds = ds.map_batches(
                validate_batch, batch_format="pyarrow", batch_size=self.cfg.batch_size
            )
            ds = ds.map_batches(
                add_partition_column,
                batch_format="pyarrow",
                fn_kwargs={
                    "num_partitions": self.cfg.num_partitions,
                    "salt_factor": self.cfg.salt_factor,
                },
            )
            manifest_ref = ray.put(
                {"watermarks": man.watermarks, "files": man.files, "rows": man.rows}
            )
            fn_kwargs = {
                "lake_dir": self.cfg.lake_dir,
                "epoch": epoch,
                "manifest_ref": manifest_ref,
                "mode": self.cfg.merge_mode,
                "auto_mor_ratio": self.cfg.auto_mor_ratio,
                "compact_threshold": self.cfg.compact_threshold,
                "policy": self.cfg.merge_policy,
                "max_attempts": self.cfg.max_attempts,
                "target_rows_per_file": self.cfg.target_rows_per_file,
                "staging_dir": self.cfg.staging_dir,
            }
            rows = (
                ds.groupby(PARTITION_COL)
                .map_groups(apply_merge_group, batch_format="pyarrow", fn_kwargs=fn_kwargs)
                .take_all()
            )
            # watermark UNCHANGED: erasure must not consume stream seqs
            # (advancing to erase_seq would skip every pending event)
            self._commit(man, epoch, man.min_watermark, rows)
            return EpochResult(
                epoch=epoch,
                seq_lo=erase_seq,
                seq_hi=erase_seq,
                n_applied=sum(r["n_applied"] for r in rows),
                n_rejected=sum(r["n_rejected"] for r in rows),
                partitions_touched=sum(1 for r in rows if r["n_applied"] > 0),
            )

    def replay(self, max_epochs: int | None = None) -> list[EpochResult]:
        """Replay until caught up with the log head (or max_epochs)."""
        results = []
        while max_epochs is None or len(results) < max_epochs:
            res = self.run_epoch()
            if res is None:
                break
            results.append(res)
        return results

    def follow(
        self,
        poll_ms: int = 1000,
        *,
        max_polls: int | None = None,
        max_epochs_per_round: int | None = None,
        stop: "callable | None" = None,
    ) -> list[EpochResult]:
        """Continuous tail: replay to the head, then poll for new log files.

        The reference's consumer loop — fetch, then idle
        ``idle-time-betweeen-record-fetch`` (default 1000 ms,
        ``consumer/AbstractKinesisConsumerProcessor.java:121-128``) —
        restated over the file log: rescan for new/appended files each
        poll, replay whatever arrived.  ``max_polls`` / ``stop()`` bound
        the loop for tests and drains; a real deployment runs unbounded
        under ``ray job submit``.
        """
        import time as _time

        results: list[EpochResult] = []
        polls = 0
        while True:
            results.extend(self.replay(max_epochs=max_epochs_per_round))
            if stop is not None and stop():
                break
            polls += 1
            if max_polls is not None and polls >= max_polls:
                break
            _time.sleep(poll_ms / 1000.0)
            self.log_infos(refresh=True)
        return results

    # ------------------------------------------------------------------
    def _read_num_blocks(self) -> int:
        # Pre-shuffle block count sets both read parallelism and the sort
        # shuffle's reduce-partition count (and hence merge-task count).
        # Too few (Ray's default coalesces small files toward 128 MiB
        # blocks) serializes the merge; far too many drowns 2M-row epochs
        # in tiny-block scheduling.  ~2 blocks per core, floored at the
        # partition count, measured best across 8..32 cpus.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        return max(2 * cpus, self.cfg.num_partitions)

    def _commit(
        self,
        man: Manifest,
        epoch: int,
        hi: int,
        lineage_rows: list[dict],
        *,
        clear_deadletters: list[str] | None = None,
    ) -> None:
        files = dict(man.files)
        rows_count = dict(man.rows)
        rejected_files = list(man.rejected_files)
        lineage_files = list(man.lineage_files)
        deadletter_files = list(man.deadletter_files)
        if clear_deadletters:
            # reprocessed quarantine files leave the live set atomically
            # with this commit (a crash before it changes nothing); rows
            # that failed AGAIN re-enter below under this epoch's paths
            drop = set(clear_deadletters)
            deadletter_files = [f for f in deadletter_files if f not in drop]

        for r in lineage_rows:
            p = r["partition"]
            data = [f for f in r["output_files"] if f.startswith("data/")]
            rejs = [f for f in r["output_files"] if f.startswith("rejected/")]
            dls = [f for f in r["output_files"] if f.startswith("deadletter/")]
            if r["n_applied"] > 0 and data:
                if r.get("file_mode") == "append":  # mor delta joins the live set
                    files[p] = list(files.get(p, [])) + data
                else:  # cow rewrite / mor compaction fold replaces it
                    files[p] = data
                rows_count[p] = r["n_rows_after"]
            rejected_files.extend(rejs)
            deadletter_files.extend(dls)

        if lineage_rows:
            rel = f"lineage/epoch={epoch}.parquet"
            path = os.path.join(self.cfg.lake_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            cols = {f.name: [r[f.name] for r in lineage_rows] for f in LINEAGE_SCHEMA}
            pq.write_table(pa.Table.from_pydict(cols, schema=LINEAGE_SCHEMA), path)
            lineage_files.append(rel)

        new_man = Manifest(
            epoch=epoch,
            num_partitions=man.num_partitions,
            salt_factor=man.salt_factor,
            hash_fingerprint=man.hash_fingerprint,
            watermarks={p: hi for p in range(man.num_partitions)},
            files=files,
            rows=rows_count,
            lineage_files=lineage_files,
            rejected_files=rejected_files,
            deadletter_files=deadletter_files,
        )
        self.store.commit(new_man)

    # ------------------------------------------------------------------
    # Readers over the committed snapshot
    def final_state(self, sort: bool = False) -> ray.data.Dataset:
        """The lake as of the latest commit (transcript columns).

        Merge-on-read resolution happens here: one task per partition
        reads its base+delta files and resolves LWW/tombstones locally
        (no shuffle — a partition's files are self-contained by
        construction).  With cow-only partitions (one live file, no
        tombstones) the resolve is a no-op pass.
        """
        return self._state_from_manifest(self.store.latest(), sort=sort)

    def state_at(self, epoch: int, sort: bool = False) -> ray.data.Dataset:
        """Time travel: the lake exactly as of commit ``epoch``.

        Manifest snapshots are immutable and named by epoch, so a
        historical read is just the same partition-resolve pipeline over
        the old snapshot's file list — identical machinery, older
        pointer (the Iceberg/Delta ``VERSION AS OF`` semantic).  Valid
        until :meth:`vacuum` deletes files only the old snapshot
        references; a vacuumed-away snapshot fails loud here instead of
        returning a partial state.
        """
        man = self.store.at_epoch(epoch)
        if man is None:
            raise ValueError(
                f"no manifest committed at epoch {epoch} "
                f"(committed epochs: {self.store.epochs()!r})"
            )
        missing = [
            f
            for fs in man.files.values()
            for f in fs
            if not os.path.exists(os.path.join(self.cfg.lake_dir, f))
        ]
        if missing:
            raise RuntimeError(
                f"epoch {epoch} is no longer time-travelable: {len(missing)} of its "
                f"data files were vacuumed (e.g. {missing[0]!r}); only epochs whose "
                "files survive vacuum can be read"
            )
        return self._state_from_manifest(man, sort=sort)

    def state_diff(
        self, epoch_old: int, epoch_new: int | None = None, *, sort: bool = True
    ) -> ray.data.Dataset:
        """Snapshot-to-snapshot diff: every (conv_id, turn_idx) key whose
        resolved value differs between commit ``epoch_old`` and commit
        ``epoch_new`` (default: head), classified added/updated/deleted.

        Scale shape: both snapshots use the SAME partitioner, so each
        partition's two file sets are diffed in ONE local task — resolve
        old, resolve new, sort-pair the keys — with NO shuffle anywhere;
        the only moved bytes are the (small) diff rows themselves.  This
        is the audit surface a downstream consumer uses to reconcile a
        derived table against the lake without replaying the changefeed."""
        man_old = self.store.at_epoch(epoch_old)
        if man_old is None:
            raise ValueError(
                f"no manifest committed at epoch {epoch_old} "
                f"(committed epochs: {self.store.epochs()!r})"
            )
        man_new = (
            self.store.latest() if epoch_new is None else self.store.at_epoch(epoch_new)
        )
        if man_new is None:
            raise ValueError(f"no manifest committed at epoch {epoch_new}")
        for man, label in ((man_old, epoch_old), (man_new, epoch_new)):
            missing = [
                f
                for fs in man.files.values()
                for f in fs
                if not os.path.exists(os.path.join(self.cfg.lake_dir, f))
            ]
            if missing:
                raise RuntimeError(
                    f"epoch {label} is no longer diffable: {len(missing)} of its "
                    f"data files were vacuumed (e.g. {missing[0]!r})"
                )
        parts = sorted(set(man_old.files) | set(man_new.files))
        items = [
            {
                "paths_old": [
                    os.path.join(self.cfg.lake_dir, f) for f in man_old.files.get(p, [])
                ],
                "paths_new": [
                    os.path.join(self.cfg.lake_dir, f) for f in man_new.files.get(p, [])
                ],
            }
            for p in parts
            if man_old.files.get(p) or man_new.files.get(p)
        ]
        if not items:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "conv_id": pa.array([], pa.string()),
                        "turn_idx": pa.array([], pa.int32()),
                        "change_kind": pa.array([], pa.string()),
                    }
                )
            )
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ds = ds.map_batches(
            _diff_partition,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={"policy": self.cfg.merge_policy},
        )
        return ds.sort(["conv_id", "turn_idx"]) if sort else ds

    def _state_from_manifest(self, man: Manifest | None, sort: bool) -> ray.data.Dataset:
        items = []
        if man:
            for p, fs in sorted(man.files.items()):
                if fs:
                    items.append(
                        {
                            "paths": [os.path.join(self.cfg.lake_dir, f) for f in fs],
                        }
                    )
        if not items:
            return ray.data.from_arrow(LAKE_SCHEMA.empty_table().select(TRANSCRIPT_COLS))
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ds = ds.map_batches(
            _resolve_partition,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={"policy": self.cfg.merge_policy},
        )
        if sort:
            ds = ds.sort(["conv_id", "turn_idx"])
        return ds

    def lookup_partitions(self, conv_id: str) -> list[int]:
        """The ≤``salt_factor`` partitions ``conv_id``'s keys can hash
        to — partition placement is a pure function of the key, and the
        read side shares the writer's exact (uint64-wrapping) formula
        via ``stages.partition.partitions_for_conv``."""
        from ..stages.partition import partitions_for_conv

        return sorted(
            partitions_for_conv(conv_id, self.cfg.num_partitions, self.cfg.salt_factor)
        )

    def read_conversation(self, conv_id: str) -> ray.data.Dataset:
        """Point lookup: ONE conversation in turn order, reading only
        the partitions its keys can hash to (manifest-level pruning —
        the salted-hash layout IS the lake's index).  At ``P=16, S=4``
        this touches ≤1/4 of the lake's files regardless of lake size;
        the conversation's salted sub-shards re-merge via the final
        turn-order sort (the documented read-time re-merge)."""
        man = self.store.latest()
        parts = set(self.lookup_partitions(conv_id))
        items = []
        if man:
            for p, fs in sorted(man.files.items()):
                if p in parts and fs:
                    items.append({"paths": [os.path.join(self.cfg.lake_dir, f) for f in fs]})
        if not items:
            return ray.data.from_arrow(LAKE_SCHEMA.empty_table().select(TRANSCRIPT_COLS))
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        ds = ds.map_batches(
            _resolve_partition,
            batch_format="pyarrow",
            batch_size=None,
            # key filter pushed into the parquet read: row groups that
            # can't contain the conversation never leave storage
            fn_kwargs={
                "policy": self.cfg.merge_policy,
                "filters": [("conv_id", "==", conv_id)],
            },
        )
        return ds.sort("turn_idx")

    def changes_between(self, lo: int, hi: int) -> ray.data.Dataset:
        """Changefeed: the NET change per (conv_id, turn_idx) in the seq
        window ``(lo, hi]`` — each key's latest VALID event, deletes
        included (``op='D'``) so a consumer can apply the window as an
        idempotent diff.  This is the CDC-consumer surface (Delta CDF /
        Kafka-compacted-topic analog): downstreams incrementally follow
        the lake without rereading converged state.

        Shape: offset-pruned window scan → validate → per-batch
        latest-per-key combiner (≤1 row per key per batch crosses the
        exchange) → ONE sort on the (conv_id, turn_idx) group tuple →
        block-local winner pick; the reduce side never sees more rows
        than distinct keys touched in the window.
        """
        from ..functions.debug import checked_sort

        ds = tailer.read_window(self.log_infos(), lo, hi, num_blocks=self._read_num_blocks())
        if ds is None:
            return ray.data.from_arrow(_changefeed_empty())
        ds = ds.map_batches(
            validate_batch, batch_format="pyarrow", batch_size=self.cfg.batch_size
        ).map_batches(_changefeed_partial, batch_format="pyarrow")
        # the winner within a co-located run is picked by the same
        # latest-per-key kernel (idempotent on already-combined rows)
        return checked_sort(ds, ["conv_id", "turn_idx"]).map_batches(
            _changefeed_latest, batch_format="pyarrow", batch_size=None
        )

    def epoch_changes(self, epoch: int | None = None) -> ray.data.Dataset:
        """The changefeed of one committed epoch's seq window (default:
        the latest).  Window bounds come from the immutable manifest
        snapshots — (previous epoch's watermark, this epoch's]."""
        lo, hi = self._epoch_window(epoch)
        return self.changes_between(lo, hi)

    def _epoch_window(self, epoch: int | None) -> tuple[int, int]:
        """The seq window (lo, hi] one committed epoch covered, from the
        immutable manifest snapshots.  Fails LOUD when the previous
        epoch's manifest was expired — silently falling back to lo=-1
        would present the cumulative change since genesis as one
        epoch's diff (the same failure class state_at guards against)."""
        man_hi = self.store.latest() if epoch is None else self.store.at_epoch(epoch)
        if man_hi is None:
            raise ValueError(
                f"no manifest committed at epoch {epoch} "
                f"(committed epochs: {self.store.epochs()!r})"
            )
        if man_hi.epoch == 0:
            return (-1, man_hi.min_watermark)
        man_lo = self.store.at_epoch(man_hi.epoch - 1)
        if man_lo is None:
            raise ValueError(
                f"epoch {man_hi.epoch}'s window is unrecoverable: the previous "
                f"epoch's manifest was expired (expire_snapshots keeps too little "
                "history for changefeed consumers of this epoch)"
            )
        return (man_lo.min_watermark, man_hi.min_watermark)

    def hot_keys(self, top_n: int = 20) -> ray.data.Dataset:
        """Hot-key churn report: the ``top_n`` conversations by VALID
        change-event volume over the consumed stream, with the op mix
        (inserts/updates/deletes) — the audit a operator runs to decide
        which keys need salting (the engine salts `c0`-style keys for
        exactly the skew this surfaces).

        Scale shape: a validated window scan with per-batch
        ``(conv_id → counts)`` combiner partials (the exchange is
        bounded by distinct conversations per batch, never rows), one
        grouped exchange, then a deterministic (n DESC, conv_id) top-k.
        """
        from ray.data.aggregate import Sum

        from ..functions.debug import null_safe_groupby_agg, null_safe_sort

        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_changes": pa.array([], pa.int64()),
                "n_inserts": pa.array([], pa.int64()),
                "n_updates": pa.array([], pa.int64()),
                "n_deletes": pa.array([], pa.int64()),
            }
        )
        man = self.store.latest()
        # the consumed window is (start position, head watermark]: epoch 0
        # pins the start (LATEST lakes pin it to the head seq at first
        # start — events before it were never consumed and must not be
        # counted).  An expired genesis falls back to the full log, which
        # is exact for TRIM_HORIZON lakes; for a LATEST lake the start
        # position is unrecoverable, so fail LOUD rather than silently
        # over-counting pre-position events (same contract as the
        # expired-history changefeed guard above)
        from ..config import LATEST

        man0 = self.store.at_epoch(0)
        if man0 is None and self.cfg.initial_position == LATEST:
            raise ValueError(
                "hot_keys on a LATEST lake whose genesis manifest was expired: "
                "the pinned start position is unrecoverable (expire_snapshots "
                "kept too little history), so the consumed window cannot be "
                "bounded — the report would over-count never-consumed events"
            )
        lo = man0.min_watermark if man0 is not None else -1
        if man is None or man.min_watermark <= lo:
            # nothing consumed yet — schema-stable empty report (an
            # all-empty Dataset pipeline loses its schema in to_pandas)
            return ray.data.from_arrow(empty)
        ds = tailer.read_window(
            self.log_infos(), lo, man.min_watermark, num_blocks=self._read_num_blocks()
        )
        if ds is None:
            return ray.data.from_arrow(empty)

        def partial(b: pa.Table) -> pa.Table:
            b = validate_batch(b)
            b = b.filter(pc.is_null(b.column("reject_reason")))
            if b.num_rows == 0:
                return empty
            op = b.column("op").combine_chunks()
            t = pa.table(
                {
                    "conv_id": b.column("conv_id"),
                    "n_changes": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                    "n_inserts": pc.fill_null(pc.equal(op, "I"), False).cast(pa.int64()),
                    "n_updates": pc.fill_null(pc.equal(op, "U"), False).cast(pa.int64()),
                    "n_deletes": pc.fill_null(pc.equal(op, "D"), False).cast(pa.int64()),
                }
            )
            g = t.group_by(["conv_id"]).aggregate(
                [(c, "sum") for c in ("n_changes", "n_inserts", "n_updates", "n_deletes")]
            )
            return pa.table(
                {
                    "conv_id": g.column("conv_id"),
                    "n_changes": g.column("n_changes_sum"),
                    "n_inserts": g.column("n_inserts_sum"),
                    "n_updates": g.column("n_updates_sum"),
                    "n_deletes": g.column("n_deletes_sum"),
                }
            )

        agg = null_safe_groupby_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            "conv_id",
            Sum("n_changes", alias_name="n_changes"),
            Sum("n_inserts", alias_name="n_inserts"),
            Sum("n_updates", alias_name="n_updates"),
            Sum("n_deletes", alias_name="n_deletes"),
            out_types={
                "n_changes": pa.int64(),
                "n_inserts": pa.int64(),
                "n_updates": pa.int64(),
                "n_deletes": pa.int64(),
            },
        )
        return null_safe_sort(
            agg, ["n_changes", "conv_id"], descending=[True, False]
        ).limit(top_n)

    def touched_conversations(self, lo: int, hi: int) -> set[str]:
        """Distinct conv_ids with ≥1 VALID change event in ``(lo, hi]``
        — the dirty-key set for incremental view refresh.  No sort
        exchange, no winner resolution: a validated window scan with
        per-batch ``pc.unique`` partials; only the deduped key set
        reaches the driver (bounded by conversations touched per epoch,
        the quantity any dirty-group scheme must materialize)."""
        import pyarrow.compute as pc

        ds = tailer.read_window(self.log_infos(), lo, hi, num_blocks=self._read_num_blocks())
        if ds is None:
            return set()

        def keys(b: pa.Table) -> pa.Table:
            b = validate_batch(b)
            b = b.filter(pc.is_null(b.column("reject_reason")))
            return pa.table({"conv_id": pc.unique(b.column("conv_id").combine_chunks())})

        return {r["conv_id"] for r in ds.map_batches(keys, batch_format="pyarrow").take_all()}

    def lineage(self) -> ray.data.Dataset:
        man = self.store.latest()
        paths = [os.path.join(self.cfg.lake_dir, f) for f in (man.lineage_files if man else [])]
        if not paths:
            return ray.data.from_arrow(LINEAGE_SCHEMA.empty_table())
        # columns pinned so the epoch=N path segment isn't inferred as a
        # hive-partition column.  The manifest already points at the
        # compact_metadata() output when it has run (compaction swaps
        # lineage_files to the one consolidated file), so this read
        # automatically prefers the compacted form.  Metadata files are
        # tiny — one read task per file, never Ray's ~200-block floor.
        return ray.data.read_parquet(
            paths,
            columns=[f.name for f in LINEAGE_SCHEMA],
            override_num_blocks=len(paths),
        )

    def rejected(self) -> ray.data.Dataset:
        man = self.store.latest()
        paths = [os.path.join(self.cfg.lake_dir, f) for f in (man.rejected_files if man else [])]
        if not paths:
            return ray.data.from_arrow(REJECTED_SCHEMA.empty_table())
        return ray.data.read_parquet(
            paths,
            columns=[f.name for f in REJECTED_SCHEMA],
            override_num_blocks=len(paths),
        )

    def compact_metadata(self) -> Manifest | None:
        """Consolidate per-epoch lineage / rejected files into one file each.

        At 10^10-event scale a long-running stream accumulates one
        lineage file and possibly many rejected files per epoch; without
        compaction the manifest (and every metadata read) grows without
        bound.  Data files never need this — COW already keeps exactly
        one live file per partition.  Runs under the same 2PC rules:
        consolidated files are written first, then ONE manifest commit
        swaps the references; a crash in between leaves the previous
        manifest (and the old files) fully intact.
        """
        with self.store.writer_lock():
            return self._compact_metadata_locked()

    def _compact_metadata_locked(self) -> Manifest | None:
        # read-modify-commit MUST hold the writer lock: racing a replay
        # commit would overwrite its manifest references (lost update)
        man = self.store.latest()
        if man is None:
            return None
        epoch = man.epoch + 1
        new_lineage = list(man.lineage_files)
        new_rejected = list(man.rejected_files)
        for files, area, out_list in (
            (man.lineage_files, "lineage", new_lineage),
            (man.rejected_files, "rejected", new_rejected),
        ):
            if len(files) <= 1:
                continue
            tables = [pq.read_table(os.path.join(self.cfg.lake_dir, f)) for f in files]
            merged = pa.concat_tables(tables, promote_options="permissive")
            # epoch= in the name keeps these vacuumable once superseded
            rel = f"{area}/epoch={epoch}-compacted.parquet"
            path = os.path.join(self.cfg.lake_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(merged, path)
            out_list.clear()
            out_list.append(rel)
        new_man = Manifest(
            epoch=epoch,
            num_partitions=man.num_partitions,
            salt_factor=man.salt_factor,
            hash_fingerprint=man.hash_fingerprint,
            watermarks=dict(man.watermarks),
            files=dict(man.files),
            rows=dict(man.rows),
            lineage_files=new_lineage,
            rejected_files=new_rejected,
            deadletter_files=list(man.deadletter_files),
        )
        self.store.commit(new_man)
        return new_man

    def compact_partitions(self, parts=None) -> dict:
        """Fold every multi-file (MOR delta) partition back to COW form
        WITHOUT consuming stream events — the Iceberg
        ``rewrite_data_files`` analog, for bounding read amplification
        before a heavy read window instead of waiting for
        ``compact_threshold`` to force it mid-ingest.

        One distributed task per multi-file partition reads its base +
        deltas, resolves winners (winning tombstones compact away), and
        writes fresh files under the NEW epoch; one manifest commit
        swaps all references with WATERMARKS UNCHANGED — the epoch
        advances but the logical state does not (``state_at(new) ==
        state_at(prior)``, ``epoch_changes(new)`` is empty).  Runs under
        the writer lock; a crash before the commit leaves the prior
        manifest intact and the orphan files vacuumable.

        ``parts`` optionally restricts to specific partition ids.
        Returns a receipt ``{epoch, partitions_compacted, files_before,
        files_after}``.

        Winner resolution uses THIS engine's configured
        ``merge_policy`` — a lake written under a custom policy must be
        compacted through an engine configured with the same policy
        (the bare CLI cannot inject one), or conflicting versions would
        be re-decided by default LWW and baked in.
        """
        with self.store.writer_lock():
            # current_manifest (not raw latest): runs the fingerprint /
            # partition-param drift guards every write path runs, and
            # handles the empty-lake case (epoch-0 manifest, no files)
            man = self.current_manifest()
            # only MOR DELTA sets need folding — a COW set split across
            # multiple files by target_rows_per_file is already compact,
            # and rewriting it every run would never reach idempotence
            targets = sorted(
                p
                for p, fs in man.files.items()
                if any(f.endswith(".delta.parquet") for f in fs)
                and (parts is None or p in set(parts))
            )
            if not targets:
                return {
                    "epoch": man.epoch,
                    "partitions_compacted": 0,
                    "files_before": sum(len(f) for f in man.files.values()),
                    "files_after": sum(len(f) for f in man.files.values()),
                }
            epoch = man.epoch + 1
            items = [{"part": p, "rels": list(man.files[p])} for p in targets]
            receipts = (
                ray.data.from_items(items, override_num_blocks=len(items))
                .map_batches(
                    _compact_partition_task,
                    batch_format="pyarrow",
                    batch_size=None,
                    fn_kwargs={
                        "lake_dir": self.cfg.lake_dir,
                        "epoch": epoch,
                        "policy": self.cfg.merge_policy,
                        "cap": self.cfg.target_rows_per_file,
                    },
                )
                .take_all()
            )  # ≤ P receipt rows — tiny
            files = dict(man.files)
            rows = dict(man.rows)
            for r in receipts:
                p = int(r["part"])
                if r["rels"]:
                    files[p] = list(r["rels"])
                    rows[p] = int(r["rows"])
                else:  # every key tombstoned away — drop BOTH entries
                    files.pop(p, None)
                    rows.pop(p, None)
            new_man = Manifest(
                epoch=epoch,
                num_partitions=man.num_partitions,
                salt_factor=man.salt_factor,
                hash_fingerprint=man.hash_fingerprint,
                watermarks=dict(man.watermarks),  # no events consumed
                files=files,
                rows=rows,
                lineage_files=list(man.lineage_files),
                rejected_files=list(man.rejected_files),
                deadletter_files=list(man.deadletter_files),
            )
            self.store.commit(new_man)
            return {
                "epoch": epoch,
                "partitions_compacted": len(targets),
                "files_before": sum(len(f) for f in man.files.values()),
                "files_after": sum(len(f) for f in files.values()),
            }

    def expire_snapshots(self, keep_last: int) -> int:
        """Bound manifest history: keep only the newest ``keep_last``
        snapshots (the current one always survives).  Expired epochs
        stop being time-travelable; data-file reclamation stays
        vacuum's job.  Together (expire → vacuum) they bound BOTH
        metadata and storage on a long-running stream."""
        return self.store.expire(keep_last)

    def vacuum(self) -> int:
        """Delete files no committed manifest will ever reference again.

        COW rewrites and MOR compaction folds supersede files without
        deleting them (they must survive until the manifest commit so a
        crash can fall back); on a long stream the orphans accumulate
        forever.  Safe deletion rule: a file under an ``epoch=N`` path is
        removable iff N ≤ the latest committed epoch AND the latest
        manifest does not reference it — files of any in-flight epoch
        (N > committed) are never touched, so vacuum can run
        concurrently with ingestion.  Returns the number deleted.
        """
        import re

        man = self.store.latest()
        if man is None:
            return 0
        referenced: set[str] = set(man.lineage_files) | set(man.rejected_files) | set(
            man.deadletter_files
        )
        for fs in man.files.values():
            referenced.update(fs)
        epoch_re = re.compile(r"epoch=(\d+)")
        deleted = 0
        # _staging/attempts holds the per-(epoch, partition) attempt
        # counters — never referenced by a manifest, removable once the
        # epoch is committed (same N ≤ committed-epoch rule).
        for area in ("data", "rejected", "lineage", "deadletter", "_staging/attempts"):
            root = os.path.join(self.cfg.lake_dir, area)
            if not os.path.isdir(root):
                continue
            for dirpath, _, names in os.walk(root, topdown=False):
                for name in names:
                    full = os.path.join(dirpath, name)
                    # normalize to '/' — manifest paths are stored POSIX-style
                    rel = os.path.relpath(full, self.cfg.lake_dir).replace(os.sep, "/")
                    m = epoch_re.search(rel)
                    if rel in referenced or m is None or int(m.group(1)) > man.epoch:
                        continue
                    os.remove(full)
                    deleted += 1
                try:  # prune emptied epoch directories
                    os.rmdir(dirpath)
                except OSError:
                    pass
        return deleted

    def deadletter(self) -> ray.data.Dataset:
        """Quarantined batches (deterministic merge failures) for replay/triage."""
        from ..schema import CHANGELOG_SCHEMA

        man = self.store.latest()
        paths = [os.path.join(self.cfg.lake_dir, f) for f in (man.deadletter_files if man else [])]
        if not paths:
            return ray.data.from_arrow(CHANGELOG_SCHEMA.empty_table())
        # columns pinned so the epoch=N path segment isn't hive-inferred
        # as an extra column (schema must match the empty case)
        return ray.data.read_parquet(paths, columns=[f.name for f in CHANGELOG_SCHEMA])
