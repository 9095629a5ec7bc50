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


def find_colocation_violations(ds: ray.data.Dataset, keys: list[str]) -> list:
    """Key tuples that span adjacent blocks of ``ds`` (empty = invariant
    holds).  ``ds`` must already be sorted by ``keys``.  Dataset row
    order is stable through ``map_batches``, so the collected boundary
    rows come back in block order: rows alternate (first, last) per
    non-empty block, and the invariant is ``last(i) != first(i+1)``.
    Metadata-cheap: two boundary rows per block move, never data."""
    rows = ds.map_batches(
        _boundary_batch, batch_format="pyarrow", batch_size=None, fn_kwargs={"keys": keys}
    ).take_all()
    assert len(rows) % 2 == 0
    out = []
    for i in range(1, len(rows) - 1, 2):
        hi = tuple(rows[i][k] for k in keys)
        lo = tuple(rows[i + 1][k] for k in keys)
        if hi == lo:
            out.append(hi)
    return out


def check_sort_colocation(ds: ray.data.Dataset, keys: list[str]) -> None:
    """Assert no sort key value spans adjacent blocks of ``ds``."""
    viol = find_colocation_violations(ds, keys)
    if viol:
        raise AssertionError(
            f"Ray sort split an equal-key run across blocks: key {viol[0]!r} is the "
            f"last row of one block and the first of the next. The blockwise "
            f"group operators (dedup/sessionize/window finalize) are NOT safe "
            f"on this Ray version — see tests/test_sort_colocation.py."
        )


# Sentinels for the null-safe exchange: Ray's sample-based range
# partitioner compares raw Python values when planning boundaries, and a
# None landing in the sample raises TypeError (observed, nondeterministic
# — it depends on which rows the sampler draws).  The exchange wrappers
# below therefore sort/group on shadow key columns with nulls filled to
# a reserved extreme; the fill asserts the sentinel is absent from real
# data, so a collision fails loud instead of silently merging groups.
#
# One spec drives fill AND restore so the two can never drift: shadow
# types are CANONICAL (every signed/narrow int and timestamp widens to
# int64) — restore returns the canonical type, which is identity for
# every key the engine uses (int64 / string / float64).
NULL_INT_SENTINEL = -(2**63)  # int64 min
NULL_UINT_SENTINEL = 2**64 - 1
NULL_STR_SENTINEL = "\x00"


def _shadow_spec(t: pa.DataType):
    """(canonical shadow type, sentinel) for a key type, or None if the
    type has no shadow mapping (the caller decides whether that is a
    pass-through or an error)."""
    if pa.types.is_uint64(t):
        return pa.uint64(), NULL_UINT_SENTINEL
    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        return pa.int64(), NULL_INT_SENTINEL
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.string(), NULL_STR_SENTINEL
    if pa.types.is_floating(t):
        return pa.float64(), float("-inf")
    return None


def _null_safe_fill(col: pa.ChunkedArray, *, strict: bool = False):
    """Shadow copy of a key column: canonical type, nulls → sentinel.

    ``strict=True`` (the groupby path, where the shadow must round-trip
    back through ``_restore``) raises on unmapped types; the sort path
    passes them through so the raw sort fails loudly as before."""
    import pyarrow.compute as pc

    spec = _shadow_spec(col.type)
    if spec is None:
        if strict:
            raise TypeError(f"null-safe exchange: unsupported key type {col.type}")
        return col
    cast_t, sent = spec
    if col.type != cast_t:
        col = col.cast(cast_t)
    # typed scalar: a bare python int 2**64-1 overflows Arrow's default
    # int64 scalar inference for the uint64 sentinel
    sent = pa.scalar(sent, cast_t)
    # always assert (not only when nulls are present): restore() maps the
    # sentinel back to NULL, so a legitimate sentinel value would be
    # silently nulled if it slipped through
    if pc.any(pc.equal(col, sent)).as_py():
        raise ValueError(
            f"null-safe exchange sentinel {sent!r} collides with real data in a "
            f"{col.type} key column — choose a different exchange key"
        )
    return pc.fill_null(col, sent) if col.null_count else col


def _restore(col: pa.ChunkedArray):
    """Inverse of :func:`_null_safe_fill` on a shadow column: sentinel →
    NULL.  Returns the canonical type (identity for engine keys)."""
    import pyarrow.compute as pc

    spec = _shadow_spec(col.type)
    if spec is None:  # unreachable via strict fill; defensive
        return col
    _, sent = spec
    sent = pa.scalar(sent, col.type)
    return pc.if_else(pc.equal(col, sent), pa.nulls(len(col), col.type), col)


def _with_shadow_keys(ds: ray.data.Dataset, key_list: list[str], *, strict: bool = False):
    """Append ``__ns_<key>`` shadow columns; returns (ds, shadow names)."""
    shadow = {k: f"__ns_{k}" for k in key_list}

    def add(b: pa.Table) -> pa.Table:
        for k, sk in shadow.items():
            b = b.append_column(sk, _null_safe_fill(b.column(k), strict=strict))
        return b

    return ds.map_batches(add, batch_format="pyarrow"), [shadow[k] for k in key_list]


def _drop_columns_fn(names: list[str]):
    def drop(b: pa.Table) -> pa.Table:
        return b.drop_columns(names)

    return drop


def null_safe_sort(ds: ray.data.Dataset, keys, *, descending=None) -> ray.data.Dataset:
    """``ds.sort(keys)`` that tolerates NULLs in the key columns.

    Adds shadow ``__ns_<key>`` columns (nulls filled to a reserved
    sentinel), sorts on those, and drops them after — so all null keys
    form ONE co-located run (SQL GROUP BY / PARTITION BY semantics) and
    Ray's boundary sampler never sees a None.  Zero-copy when a batch's
    key columns carry no nulls (the common case: the shadow is the
    same Arrow buffer)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    pre, skeys = _with_shadow_keys(ds, key_list)
    out = pre.sort(skeys, **({"descending": descending} if descending is not None else {}))
    return out.map_batches(_drop_columns_fn(skeys), batch_format="pyarrow")


def null_safe_groupby_agg(ds: ray.data.Dataset, keys, *aggs, out_types=None) -> ray.data.Dataset:
    """``ds.groupby(keys).aggregate(*aggs)`` that tolerates NULL keys.

    Ray's groupby is sort-based, so a NULL group key hits the same
    nondeterministic boundary-sampling TypeError as a null sort key.
    Same shadow-sentinel mechanism as :func:`null_safe_sort`: group on
    filled copies, then restore the sentinel back to NULL in the output
    (SQL GROUP BY keeps null groups, so they must survive round-trip).
    Key columns come back in CANONICAL types (int64 for narrow ints and
    timestamps — identity for every key the engine uses).

    ``out_types`` (optional ``{column: pa.DataType}``) pins aggregate
    output columns: an all-null group's Sum yields an Arrow null-typed
    block that would otherwise fail schema unification downstream.
    """
    import pyarrow.compute as pc  # noqa: F401  (restore uses it via _restore)

    key_list = [keys] if isinstance(keys, str) else list(keys)
    pre, skeys = _with_shadow_keys(ds, key_list, strict=True)
    out = pre.groupby(skeys).aggregate(*aggs)

    def restore(b: pa.Table) -> pa.Table:
        for k, sk in zip(key_list, skeys):
            b = b.drop_columns([sk]).append_column(k, _restore(b.column(sk)))
        if out_types:
            for c, t in out_types.items():
                if b.column(c).type != t:
                    b = b.set_column(b.schema.get_field_index(c), c, b.column(c).cast(t))
        names = key_list + [c for c in b.schema.names if c not in key_list]
        return b.select(names)

    return out.map_batches(restore, batch_format="pyarrow")


def checked_sort(ds: ray.data.Dataset, keys, *, descending=None, check_keys=None) -> ray.data.Dataset:
    """``ds.sort(keys, descending=...)``, null-safe (shadow sentinel
    keys — see :func:`null_safe_sort`), with the co-location invariant
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
    pre, skeys = _with_shadow_keys(ds, key_list)
    out = pre.sort(skeys, descending=descending) if descending is not None else pre.sort(skeys)
    out = out.map_batches(_drop_columns_fn(skeys), batch_format="pyarrow")
    # ALWAYS-ON run-integrity check and repair (round-2 advice upgraded
    # after the hot-key stress suite proved the exposure): Ray sort DOES
    # split an equal-key run across blocks once the run outgrows
    # target_max_block_size — the norm for hot keys at scale, silent
    # wrong answers for every blockwise kernel.  The check is
    # metadata-cheap (2 boundary rows per block); on violation, coalesce
    # adjacent blocks (order-preserving repartition) until every run is
    # whole.  A hot run larger than worker memory then fails LOUD in the
    # kernel instead of returning quietly wrong results.  Materializing
    # here also pins block splits, which a lazy sorted plan would
    # re-draw on every consumption.
    out = out.materialize()
    keys_to_check = check_keys or key_list
    for _ in range(64):
        if not find_colocation_violations(out, keys_to_check):
            break
        nb = out.num_blocks()
        if nb <= 1:
            break  # single block: no boundaries left
        out = out.repartition(max(1, nb // 2)).materialize()
    else:  # pragma: no cover - 2^64 blocks
        raise AssertionError("run-integrity repair did not converge")
    return out
