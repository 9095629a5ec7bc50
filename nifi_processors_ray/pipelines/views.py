"""Incremental materialized-view maintenance over the CDC lake.

At 10^10-event scale you cannot recompute lake-wide aggregates after
every epoch; the changefeed exists so downstreams refresh ONLY what
changed.  This module maintains a per-conversation statistics view
(the ``conversation_token_stats`` aggregate) with the classic
dirty-group algorithm:

1. the epoch's changefeed names the DIRTY conversations (net change
   per key → distinct conv_ids, a metadata-sized set per epoch);
2. their current rows are re-read from the lake through the SAME
   partition pruning as point lookups (≤ salt_factor partitions per
   dirty conversation — cold partitions are never touched);
3. the view is STORED as hash-partitioned parquet (conv_id →
   partition, immutable ``part-{p}-e{epoch}.parquet`` files); a refresh
   rewrites only the partitions that contain a dirty conversation —
   each rewrite task drops the dirty rows from the prior partition file
   and splices in the recomputed ones (deleted conversations just
   disappear: recompute yields no row).  Clean partitions are carried
   forward BY REFERENCE in the manifest — zero I/O, exactly the lake's
   own commit pattern, so a view over billions of conversations never
   materializes on the driver and an epoch's refresh cost is
   O(dirty partitions), not O(view);
4. the view commits under the manifest pattern (immutable
   ``view-manifest-{epoch}.json`` + atomic CURRENT swap), so a crashed
   refresh leaves the previous consistent view.

The invariant — incremental view == full recompute after every epoch —
is pinned by ``tests/test_views.py``, along with the pruning contract
(a refresh touches only dirty partitions' files).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import hash_strings_u64
from ..stages.partition import partitions_for_conv
from .conversations import token_stats
from .replay import CdcEngine, _resolve_partition

VIEW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("bpe_tokens", pa.int64()),
        ("tool_turns", pa.int64()),
    ]
)


def _view_parts(conv_ids, num_partitions: int) -> np.ndarray:
    """View partition per conv_id — a pure function of the key (no salt:
    the view has one row per conversation, there is no hot-key skew)."""
    return (hash_strings_u64(conv_ids) % np.uint64(num_partitions)).astype(np.int32)


def _rewrite_partition(
    batch: pa.Table, view_dir: str, epoch: int, dirty_ref, fresh_ref
) -> pa.Table:
    """Rewrite ONE dirty view partition: prior rows minus dirty convs,
    plus this partition's recomputed rows.  Runs distributed (one task
    per dirty partition); the driver never holds partition data."""
    dirty_keys = ray.get(dirty_ref) if isinstance(dirty_ref, ray.ObjectRef) else dirty_ref
    fresh = ray.get(fresh_ref) if isinstance(fresh_ref, ray.ObjectRef) else fresh_ref
    out_p, out_rows, out_file = [], [], []
    for i in range(batch.num_rows):
        part = int(batch.column("part")[i].as_py())
        prior_file = batch.column("prior_file")[i].as_py()
        if prior_file:
            prior = pq.read_table(os.path.join(view_dir, prior_file))
            prior = prior.filter(
                pc.invert(pc.is_in(prior.column("conv_id"), value_set=dirty_keys))
            )
        else:
            prior = VIEW_SCHEMA.empty_table()
        mine = fresh.filter(pc.equal(fresh.column("__part"), part)).drop_columns(
            ["__part"]
        )
        merged = pa.concat_tables([prior, mine]).sort_by([("conv_id", "ascending")])
        name = ""
        if merged.num_rows:
            name = f"part-{part:05d}-e{epoch}.parquet"
            pq.write_table(merged, os.path.join(view_dir, name))
        out_p.append(part)
        out_rows.append(merged.num_rows)
        out_file.append(name)
    return pa.table(
        {
            "part": pa.array(out_p, pa.int32()),
            "rows": pa.array(out_rows, pa.int64()),
            "file": pa.array(out_file, pa.string()),
        }
    )


class ConvStatsView:
    """Per-conversation token statistics, incrementally maintained.

    Stored as hash-partitioned parquet under ``view_dir`` with a
    manifest per refreshed epoch; ``num_partitions`` is pinned at
    creation (a different value on reopen fails loud — partition
    placement is part of the on-disk contract, like the lake's)."""

    def __init__(self, view_dir: str, num_partitions: int = 16):
        self.dir = view_dir
        os.makedirs(view_dir, exist_ok=True)
        meta_path = os.path.join(view_dir, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prior = json.load(f)
            if prior["num_partitions"] != num_partitions:
                raise ValueError(
                    f"view at {view_dir} was created with num_partitions="
                    f"{prior['num_partitions']}, reopened with {num_partitions}"
                )
        else:
            with open(meta_path, "w") as f:
                json.dump({"num_partitions": num_partitions}, f)
        self.num_partitions = num_partitions

    # -- storage (manifest-pattern: immutable snapshot + CURRENT swap) --
    def _current_manifest(self) -> dict | None:
        cur = os.path.join(self.dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.dir, name)) as f:
            return json.load(f)

    def files(self) -> dict[int, str]:
        """partition → committed data file (non-empty partitions only)."""
        man = self._current_manifest()
        if man is None:
            return {}
        return {int(p): f for p, f in man["files"].items()}

    def read_dataset(self) -> ray.data.Dataset:
        """The view as a streaming Dataset — the at-scale read path."""
        files = self.files()
        if not files:
            return ray.data.from_arrow(VIEW_SCHEMA.empty_table())
        paths = [os.path.join(self.dir, f) for _, f in sorted(files.items())]
        return ray.data.read_parquet(paths)

    def read(self) -> pa.Table:
        """Materialized convenience read (tests / small views only —
        production consumers stream :meth:`read_dataset`)."""
        files = self.files()
        if not files:
            return VIEW_SCHEMA.empty_table()
        return pa.concat_tables(
            [pq.read_table(os.path.join(self.dir, f)) for _, f in sorted(files.items())]
        )

    def last_refreshed_epoch(self) -> int:
        man = self._current_manifest()
        return 0 if man is None else int(man["epoch"])

    def _commit(self, files: dict[int, str], epoch: int) -> None:
        name = f"view-manifest-{epoch}.json"
        with open(os.path.join(self.dir, name), "w") as f:
            json.dump({"epoch": epoch, "files": {str(p): fn for p, fn in sorted(files.items())}}, f)
        tmp = os.path.join(self.dir, f"CURRENT.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.dir, "CURRENT"))

    # -- refresh -----------------------------------------------------
    def refresh(self, engine: CdcEngine, epoch: int | None = None) -> dict:
        """Fold one committed epoch into the view (default: the next
        unprocessed one).  Returns a metadata-sized receipt — the
        on-disk partitions are the product; read them via
        :meth:`read_dataset` (streaming) or :meth:`read` (small views).
        Never materializes the view on the driver."""
        latest = engine.store.latest()
        target = epoch if epoch is not None else self.last_refreshed_epoch() + 1
        if target > latest.epoch:  # nothing new committed
            return {"epoch": self.last_refreshed_epoch(), "dirty_convs": 0,
                    "partitions_rewritten": 0}
        done = self.last_refreshed_epoch()
        if target != done + 1:
            # skipping an epoch would silently lose its changes forever
            # (only the TARGET epoch's dirty keys get recomputed);
            # regressing would overwrite a newer view with an older one
            raise ValueError(
                f"view is at epoch {done}; refresh must fold epoch {done + 1} "
                f"next, not {target} (epochs fold strictly in order)"
            )
        # the re-read must use the snapshot AS OF the target epoch, not
        # the live head: folding feed k against a newer lake state would
        # leak future epochs into the view (and break consistency under
        # concurrent ingestion).  Requires the snapshot to still be
        # time-travelable (refresh before vacuum, the normal cadence).
        man = engine.store.at_epoch(target)
        if man is None:
            raise ValueError(
                f"epoch {target} snapshot expired; refresh views before expire/vacuum"
            )

        # 1. dirty conversations: validated window scan with per-batch
        #    unique partials — no changefeed sort exchange, no winner
        #    resolution (the keys are all a dirty-group refresh needs)
        dirty = engine.touched_conversations(*engine._epoch_window(target))
        prior_files = self.files()
        if not dirty:
            self._commit(prior_files, target)
            return {"epoch": target, "dirty_convs": 0, "partitions_rewritten": 0}

        # 2. pruned re-read: only LAKE partitions a dirty conversation
        #    can hash to — the point-lookup rule, via the ONE shared
        #    placement helper (uint64-wrapping, same as the writer)
        dirty_arr = pa.array(sorted(dirty), pa.string())
        parts = partitions_for_conv(
            sorted(dirty), engine.cfg.num_partitions, engine.cfg.salt_factor
        )
        items = [
            {"paths": [os.path.join(engine.cfg.lake_dir, f) for f in fs]}
            for p, fs in sorted(man.files.items())
            if p in parts and fs
        ]
        if items:
            lake = ray.data.from_items(items, override_num_blocks=len(items))
            lake = lake.map_batches(
                _resolve_partition,
                batch_format="pyarrow",
                batch_size=None,
                fn_kwargs={"policy": engine.cfg.merge_policy},
            )
            dirty_ref = ray.put(dirty_arr)

            def only_dirty(b: pa.Table) -> pa.Table:
                keys = ray.get(dirty_ref)
                return b.filter(pc.is_in(b.column("conv_id"), value_set=keys))

            stats = token_stats(lake.map_batches(only_dirty, batch_format="pyarrow"))
            # the recomputed rows are dirty-scale (one row per changed
            # conversation this epoch) — metadata-sized by the same
            # argument as the dirty-key set; collected as Arrow, never
            # through pandas, then broadcast to the rewrite tasks.
            # Ray emits SCHEMA-LESS empty blocks from sort/groupby
            # stages — drop them before the concat or it fails on the
            # zero-column schema.
            parts = [
                t.select(VIEW_SCHEMA.names).cast(VIEW_SCHEMA)
                for t in (ray.get(r) for r in stats.to_arrow_refs())
                if t.num_columns
            ]
            fresh_tbl = (
                pa.concat_tables(parts) if parts else VIEW_SCHEMA.empty_table()
            )
        else:  # every dirty conversation was deleted
            fresh_tbl = VIEW_SCHEMA.empty_table()

        # 3. rewrite ONLY the view partitions containing a dirty
        #    conversation, one distributed task per partition; clean
        #    partitions carry forward by reference (zero I/O)
        fresh_tbl = fresh_tbl.append_column(
            "__part", pa.array(_view_parts(fresh_tbl.column("conv_id"), self.num_partitions))
        )
        dirty_parts = sorted(
            set(_view_parts(dirty_arr, self.num_partitions).tolist())
        )
        # one item (= one block = one task) per dirty partition: Ray's
        # parallelism unit is the block, so a single-block from_arrow
        # would run every rewrite serially in one task
        work = [
            {"part": p, "prior_file": prior_files.get(p, "")} for p in dirty_parts
        ]
        receipts_ds = ray.data.from_items(
            work, override_num_blocks=len(work)
        ).map_batches(
            _rewrite_partition,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={
                "view_dir": self.dir,
                "epoch": target,
                "dirty_ref": ray.put(dirty_arr),
                "fresh_ref": ray.put(fresh_tbl),
            },
        )
        new_files = dict(prior_files)
        rewritten = 0
        for r in receipts_ds.take_all():
            rewritten += 1
            if r["file"]:
                new_files[int(r["part"])] = r["file"]
            else:
                new_files.pop(int(r["part"]), None)

        # 4. commit atomically
        self._commit(new_files, target)
        return {"epoch": target, "dirty_convs": len(dirty),
                "partitions_rewritten": rewritten}

    def refresh_to_head(self, engine: CdcEngine) -> dict:
        """Fold every unprocessed committed epoch, in order; returns the
        last epoch's receipt (or a no-op receipt when already caught up)."""
        receipt = {"epoch": self.last_refreshed_epoch(), "dirty_convs": 0,
                   "partitions_rewritten": 0}
        man = engine.store.latest()
        for epoch in range(self.last_refreshed_epoch() + 1, man.epoch + 1):
            receipt = self.refresh(engine, epoch)
        return receipt
