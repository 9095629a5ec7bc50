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
3. recomputed stats replace the dirty conversations' rows in the view
   (deleted conversations just disappear: recompute yields no row);
4. the view commits under the manifest pattern (immutable
   ``view-{epoch}.parquet`` + atomic CURRENT swap), so a crashed
   refresh leaves the previous consistent view.

The invariant — incremental view == full recompute after every epoch —
is pinned by ``tests/test_views.py``.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

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


class ConvStatsView:
    """Per-conversation token statistics, incrementally maintained."""

    def __init__(self, view_dir: str):
        self.dir = view_dir
        os.makedirs(view_dir, exist_ok=True)

    # -- storage (manifest-pattern: immutable snapshot + CURRENT swap) --
    def _current_path(self) -> str | None:
        cur = os.path.join(self.dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return os.path.join(self.dir, f.read().strip())

    def read(self) -> pa.Table:
        path = self._current_path()
        if path is None or not os.path.exists(path):
            return VIEW_SCHEMA.empty_table()
        return pq.read_table(path)

    def last_refreshed_epoch(self) -> int:
        path = self._current_path()
        if path is None:
            return 0
        name = os.path.basename(path)
        return int(name[len("view-") : -len(".parquet")])

    def _commit(self, table: pa.Table, epoch: int) -> None:
        name = f"view-{epoch}.parquet"
        pq.write_table(table, os.path.join(self.dir, name))
        tmp = os.path.join(self.dir, f"CURRENT.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.dir, "CURRENT"))

    # -- refresh -----------------------------------------------------
    def refresh(self, engine: CdcEngine, epoch: int | None = None) -> pa.Table:
        """Fold one committed epoch into the view (default: the next
        unprocessed one).  Returns the refreshed view table."""
        latest = engine.store.latest()
        target = epoch if epoch is not None else self.last_refreshed_epoch() + 1
        if target > latest.epoch:
            return self.read()  # nothing new committed
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
        if not dirty:
            view = self.read()
            self._commit(view, target)
            return view

        # 2. pruned re-read: only partitions a dirty conversation can
        #    hash to — the point-lookup rule, via the ONE shared
        #    placement helper (uint64-wrapping, same as the writer)
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
            dirty_ref = ray.put(pa.array(sorted(dirty), pa.string()))

            def only_dirty(b: pa.Table) -> pa.Table:
                keys = ray.get(dirty_ref)
                return b.filter(pc.is_in(b.column("conv_id"), value_set=keys))

            fresh = token_stats(lake.map_batches(only_dirty, batch_format="pyarrow"))
            fresh_tbl = pa.Table.from_pandas(fresh.to_pandas(), schema=VIEW_SCHEMA)
        else:  # every dirty conversation was deleted
            fresh_tbl = VIEW_SCHEMA.empty_table()

        # 3. replace dirty rows (a deleted conversation simply has no
        #    recomputed row), 4. commit atomically
        prior = self.read()
        keep = prior.filter(
            pc.invert(
                pc.is_in(prior.column("conv_id"), value_set=pa.array(sorted(dirty)))
            )
        )
        view = pa.concat_tables([keep, fresh_tbl]).sort_by([("conv_id", "ascending")])
        self._commit(view, target)
        return view

    def refresh_to_head(self, engine: CdcEngine) -> pa.Table:
        """Fold every unprocessed committed epoch, in order."""
        view = self.read()
        man = engine.store.latest()
        for epoch in range(self.last_refreshed_epoch() + 1, man.epoch + 1):
            view = self.refresh(engine, epoch)
        return view
