"""Block-level result hygiene.

Ray's all-to-all operators (sort, groupby) emit ZERO-COLUMN empty
blocks for empty key ranges — an acknowledged Ray-internal workaround
(``plan_udf_map_op.py``: "some all-to-all operators output empty blocks
with no schema", which is also why ``map_batches`` skips the UDF on
empty blocks, so no downstream stage can re-type them).  Those blocks
then trigger "RefBundle with a different schema" warnings in every
later exchange, masking real schema drift.

:func:`compact_small_result` removes them at the one place it is safe:
a result that is ALREADY small and being materialized anyway (a pair
set, a token-budget fill, per-partition write receipts).  Never use it
mid-pipeline on corpus-sized data — it materializes.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import ray.data


class _EmptyNewSchemaFilter(logging.Filter):
    """Drop ONLY the schema-drift warning whose NEW schema is the empty
    one (``new schema: .``) — that is Ray's own schema-less empty block
    streaming out of a sort with empty key ranges.  Ray already skips
    the warning when the OLD schema is empty
    (``streaming_executor_state.py``: ``_is_empty_schema(old_schema)``)
    but not the symmetric case; this completes that intent.  Real drift
    (two non-empty schemas) still warns."""

    def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover - trivial
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: . This may lead" in msg
        )


logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyNewSchemaFilter())


def compact_small_result(
    ds: ray.data.Dataset, schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """Materialize a small result and rebuild it from its NON-EMPTY
    blocks, dropping Ray's schema-less empties.

    ``schema`` pins the output schema when every block is empty (the
    all-empty dataset would otherwise keep a zero-column block and
    downstream consumers would see no columns at all).
    """
    mat = ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        if schema is not None:
            return ray.data.from_arrow(schema.empty_table())
        return mat
    return ray.data.from_arrow_refs(refs)


def block_offset_index(ordered, key_cols, weight_fn):
    """The distributed global-rank/prefix-sum pattern, shared.

    For a MATERIALIZED, globally sorted dataset, compute each block's
    starting offset in some global accumulation (row rank, token total,
    ...): a metadata-only boundary pass ships one row per block —
    the block's first ``key_cols`` values plus ``weight_fn(block)``
    (e.g. ``num_rows`` for rank, a column sum for weighted offsets) —
    and the driver cumsums the sorted boundary list.

    Returns ``(offset_by_first_key, total)`` where the dict maps each
    block's first-key TUPLE (scalar when one key col) to its exclusive
    offset.  Callers look up their block's first key in the assign pass
    and treat a ``KeyError`` as split drift (the dataset was consumed
    with different block splits than the boundary pass saw) — which is
    why ``ordered`` must be materialized first: a lazy sorted plan
    re-executes per consumption with different splits.
    """
    import numpy as np
    import pyarrow as pa

    def boundary(b: pa.Table) -> pa.Table:
        cols = {
            f"k{i}": b.column(c).slice(0, 1) if b.num_rows else pa.array([], b.column(c).type)
            for i, c in enumerate(key_cols)
        }
        cols["w"] = pa.array([weight_fn(b)] if b.num_rows else [], pa.int64())
        return pa.table(cols)

    rows = ordered.map_batches(boundary, batch_format="pyarrow", batch_size=None).take_all()
    keyof = (
        (lambda r: r["k0"]) if len(key_cols) == 1 else (lambda r: tuple(r[f"k{i}"] for i in range(len(key_cols))))
    )
    rows.sort(key=keyof)
    weights = [r["w"] for r in rows]
    offsets = np.concatenate([[0], np.cumsum(weights)])
    return {keyof(r): int(o) for r, o in zip(rows, offsets[:-1])}, int(offsets[-1])


def transition_pairs_block(block, group_col, order_cols, value_col):
    """Shared lag-transitions kernel: per co-located ``group_col`` run in
    ``order_cols`` order, collapse (previous value → value) steps to
    pair-count partials.

    Null robustness, matching the SQL twins' ``LAG ... PARTITION BY``:
    null group keys form ONE run (dictionary codes with nulls filled to
    -1 — a raw numpy view would surface them as NaN where NaN != NaN
    makes every null its own run), and steps FROM a null value are
    dropped (``WHERE prev IS NOT NULL``) while steps INTO one are kept.
    Returns columns (prev, next, n).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "prev": pa.array([], block.column(value_col).type),
            "next": pa.array([], block.column(value_col).type),
            "n": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([(group_col, "ascending")] + [(c, "ascending") for c in order_cols])
    g = block.column(group_col).combine_chunks().dictionary_encode().indices
    g = np.asarray(pc.fill_null(g, -1))
    new_run = np.concatenate([[True], g[1:] != g[:-1]])
    vals = block.column(value_col)
    # shift-by-one: run starts are filtered below, so clamping row 0's
    # index keeps `take` in bounds without changing the result
    prev = vals.take(pa.array(np.maximum(np.arange(n, dtype=np.int64) - 1, 0)))
    keep = pa.array(~new_run)
    if prev.null_count:
        keep = pc.and_(keep, pc.is_valid(prev))
    pairs = pa.table({"prev": prev, "next": vals}).filter(keep)
    agg = pairs.group_by(["prev", "next"]).aggregate([([], "count_all")])
    return pa.table(
        {"prev": agg.column("prev"), "next": agg.column("next"), "n": agg.column("count_all")}
    )


def sorted_build_probe_runs(block, key_col="key", side_col="side"):
    """The shared preamble of every build/probe block-join kernel: sort
    by (key, side), detect runs of equal key, and map each row to its
    run's single side-0 build row.

    Returns ``(block, key, side, starts, run_len, build_idx)`` where
    ``build_idx[i]`` is the row index of row ``i``'s run's build row, or
    −1 when the run has none.  Requires a NON-NULL key column (every
    chain hop keys on a cast FK) — a NaN-bearing float view would make
    each null its own run.

    One home for the calibrated subtleties (side ordering inside a run,
    run detection off the raw numpy view) that were previously inlined
    per kernel — a drifted copy diverges one join hop silently.
    """
    import numpy as np

    block = block.sort_by([(key_col, "ascending"), (side_col, "ascending")])
    key = np.asarray(block.column(key_col))
    side = np.asarray(block.column(side_col))
    n = len(key)
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.concatenate([starts, [n]]))
    has_build = side[starts] == 0
    build_idx = np.repeat(np.where(has_build, starts, -1), run_len)
    return block, key, side, starts, run_len, build_idx
