"""Overflow-checked integer aggregation helpers.

The engine keeps money/moment aggregates in exact int64 (IEEE float
summation order would drift vs the SQL twins), but int64 arithmetic in
Arrow/numpy WRAPS silently where DuckDB either errors immediately
(BIGINT × BIGINT overflow → OutOfRangeException) or accumulates in
HUGEINT and errors at the final ``CAST(... AS BIGINT)``.  A silently
wrapped aggregate is the worst failure mode a data engine has — these
helpers make every overflow LOUD, mirroring the twin's behavior:

- :func:`square_checked` — element-wise ``x*x`` that raises exactly
  where DuckDB's BIGINT multiply raises.
- :func:`group_sums_checked` — per-batch ``group_by(...).sum`` partials
  with a float64 shadow fold; a wrap shifts the int64 result by
  ``k·2^64`` while the shadow's rounding error stays orders of
  magnitude smaller, so comparing the two detects every wrap.  (On
  mixed-sign columns this is STRICTER than DuckDB — a batch partial can
  overflow where the stream total would not — which errs loud, never
  wrong.)

The shared fast-path fold (``functions/debug.py`` Sum) carries the same
shadow guard, so partial → exchange → fold is wrap-proof end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: |int_sum - float_shadow| beyond this means a 2^64 wrap (≈1.8e19),
#: never float rounding (≤ ~1e10 at any in-range magnitude).
_WRAP_TOLERANCE = 1e15


def square_checked(x: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """``x*x`` in int64, raising on overflow like DuckDB's BIGINT multiply."""
    return pc.multiply_checked(x, x)


def group_sums_checked(
    tbl: pa.Table,
    keys: list[str],
    sum_cols: list[str],
    *,
    count_all: bool = False,
    count_cols: list[str] | None = None,
) -> pa.Table:
    """``tbl.group_by(keys)`` int64 sums of ``sum_cols`` with a loud
    overflow guard (plus a ``<col>_count`` valid-count for each column
    in ``count_cols``, and ``count_all`` = COUNT(*) when requested —
    counts are opt-in so hot partial paths don't pay hash-agg columns
    nobody reads).

    Returns columns: keys, then ``<col>_sum`` for each requested sum
    and ``<col>_count`` for each requested count — same naming as
    Arrow's own group_by.
    """
    # magnitude precheck: if max|x| × rows can't reach 2^63, NO group's
    # partial can wrap and the float64 shadow (3 extra hash-agg columns
    # on the hottest Q1 path — measured +70% on lineitem_pricing_summary)
    # is provably unnecessary.  One O(n) min_max per column instead.
    shadow_cols = []
    for c in sum_cols:
        mm = pc.min_max(tbl.column(c))
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        bound = max(abs(lo or 0), abs(hi or 0))
        if bound and bound * tbl.num_rows >= 2**63:
            shadow_cols.append(c)
    aug = tbl
    for c in shadow_cols:
        # safe=False: Arrow's CHECKED int64→float64 cast refuses values
        # above 2^53, which are legitimate here (a batch of ±2^54 cents
        # whose group sum fits BIGINT must aggregate, not crash — DuckDB
        # succeeds).  A lossy cast is exactly what a float64 shadow
        # wants: its rounding error stays ≪ the 2^64 wrap shift.
        aug = aug.append_column(
            f"{c}__shadow", pc.cast(tbl.column(c), pa.float64(), safe=False)
        )
    aggs = [(c, "sum") for c in sum_cols]
    aggs += [(c, "count") for c in (count_cols or [])]
    aggs += [(f"{c}__shadow", "sum") for c in shadow_cols]
    if count_all:
        aggs.append(([], "count_all"))
    g = aug.group_by(keys).aggregate(aggs)
    for c in shadow_cols:
        # safe=False again: legitimate group partials may exceed 2^53
        ints = np.asarray(g.column(f"{c}_sum").cast(pa.float64(), safe=False))
        shadow = np.asarray(g.column(f"{c}__shadow_sum"))
        # all-null groups are NaN on both sides; NaN > tol is False
        if np.any(np.abs(ints - shadow) > _WRAP_TOLERANCE):
            raise OverflowError(
                f"int64 SUM overflow in batch partial of column {c!r} — "
                "the exact aggregate no longer fits BIGINT"
            )
    return g.drop_columns([f"{c}__shadow_sum" for c in shadow_cols])
