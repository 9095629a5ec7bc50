"""Debug-flag runtime invariant checks.

The blockwise group operators (exact dedup, the LSH pair generators,
sessionize, the window/quantile finalizes, the shuffle join, top-N per
group, and the conversation fold) rely on Ray sort CO-LOCATING equal
keys: a sorted
run of one key value is never split across output blocks.  That holds
empirically and is pinned by ``tests/test_sort_colocation.py`` — but a
Ray upgrade could break it silently, and the ops would then return
subtly wrong results (extra "firsts", missed pairs) in production while
CI is green against the old Ray.

``NPR_DEBUG_COLOCATION=1`` turns on a cheap global check at the call
sites: after the sort, each block reports its boundary keys and the
driver asserts no key spans a block boundary, failing LOUD before any
wrong result escapes.  Costs one extra pass over the sorted data, so on
a VERIFIED Ray version it is a flag, not a default.

On an UNVERIFIED Ray version (not in :data:`VERIFIED_RAY_VERSIONS`) the
guard ARMS ITSELF: an upgrade must not be able to silently break the
invariant in production while CI is green against the pinned version
(round-2 ADVICE).  Correctness wins over the extra pass until the new
version is re-verified (run ``tests/test_sort_colocation.py`` and the
op suites with the guard armed, then add the version to the set).
``NPR_DEBUG_COLOCATION=0`` explicitly opts out of both paths.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

ENV_FLAG = "NPR_DEBUG_COLOCATION"

# Ray versions whose sort is verified to co-locate equal full-tuple key
# runs (tests/test_sort_colocation.py + the blockwise-op suites run with
# the guard armed).  Extend ONLY after re-running those on the new pin.
VERIFIED_RAY_VERSIONS = frozenset({"2.49.2"})


def colocation_check_enabled() -> bool:
    flag = os.environ.get(ENV_FLAG)
    if flag is not None:
        return flag not in ("", "0")
    return ray.__version__ not in VERIFIED_RAY_VERSIONS


def _boundary_batch(batch: pa.Table, keys: list[str]) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in keys}
    cols["__n"] = []
    if batch.num_rows:
        for k in keys:
            col = batch.column(k)
            cols[k] = [col[0].as_py(), col[batch.num_rows - 1].as_py()]
        cols["__n"] = [batch.num_rows, batch.num_rows]
    return pa.table(
        {
            **{k: pa.array(cols[k]) for k in keys},
            "__n": pa.array(cols["__n"], pa.int64()),
        }
    )


def check_sort_colocation(ds: ray.data.Dataset, keys: list[str]) -> None:
    """Assert no sort key value spans adjacent blocks of ``ds``.

    ``ds`` must already be sorted by ``keys``.  Dataset row order is
    stable through ``map_batches``, so the collected boundary rows come
    back in block order: rows alternate (first, last) per non-empty
    block, and the invariant is ``last(block i) != first(block i+1)``.
    """
    rows = ds.map_batches(
        _boundary_batch, batch_format="pyarrow", batch_size=None, fn_kwargs={"keys": keys}
    ).take_all()
    assert len(rows) % 2 == 0
    for i in range(1, len(rows) - 1, 2):
        hi = tuple(rows[i][k] for k in keys)
        lo = tuple(rows[i + 1][k] for k in keys)
        if hi == lo:
            raise AssertionError(
                f"Ray sort split an equal-key run across blocks: key {hi!r} is the "
                f"last row of one block and the first of the next. The blockwise "
                f"group operators (dedup/sessionize/window finalize) are NOT safe "
                f"on this Ray version — see tests/test_sort_colocation.py."
            )


def checked_sort(ds: ray.data.Dataset, keys, *, descending=None, check_keys=None) -> ray.data.Dataset:
    """``ds.sort(keys, descending=...)``, with the co-location invariant
    verified when ``NPR_DEBUG_COLOCATION`` is set (debug only).
    ``check_keys`` narrows the boundary check to the group-key prefix
    when the trailing sort keys are only an intra-group order.

    When the guard is armed the sorted dataset is MATERIALIZED first and
    the materialized handle is both checked and returned: a lazy plan
    re-executes per consumption, and sample-based range partitioning may
    split blocks differently each run — checking one execution while the
    downstream consumes another would let the exact violation the guard
    exists for slip through.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    out = ds.sort(keys, descending=descending) if descending is not None else ds.sort(keys)
    if colocation_check_enabled():
        out = out.materialize()
        check_sort_colocation(out, check_keys or key_list)
    return out
