"""The engine-wide money quantization: floored integer cents.

Every oracled operator that exposes a money/quantity sum converts the
DOUBLE column to ``CAST(FLOOR(x * 100) AS BIGINT)`` — the SAME IEEE
double operation order as the SQL twins — so value-hash comparison can
never drift on float summation order.  This is the single home of that
invariant: operators must call :func:`floored_cents` rather than
re-deriving it (a drifted copy silently diverges from every oracle).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def floored_cents(col) -> pa.Array | pa.ChunkedArray:
    """``floor(float64(col) * 100) → int64``, NULL-preserving.

    Arrow kernels throughout: the numpy equivalent surfaces null as NaN
    and NaN→int64 is a C-undefined cast."""
    v = pc.multiply(pc.cast(col, pa.float64()), 100.0)
    return pc.cast(pc.floor(v), pa.int64())


def discounted_floored_cents(price, discount) -> pa.Array | pa.ChunkedArray:
    """``floor(price * (1.0 - discount) * 100) → int64``, NULL-preserving.

    Left-associated multiplies in float64 — the identical IEEE op order
    as the SQL twins' ``FLOOR(p * (1.0 - d) * 100)``.  Arrow kernels for
    the same reason as :func:`floored_cents`: a NULL in either input
    stays NULL (numpy would surface NaN and NaN→int64 is undefined)."""
    p = pc.cast(price, pa.float64())
    d = pc.cast(discount, pa.float64())
    v = pc.multiply(pc.multiply(p, pc.subtract(1.0, d)), 100.0)
    return pc.cast(pc.floor(v), pa.int64())
