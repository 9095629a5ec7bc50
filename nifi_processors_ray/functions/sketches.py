"""Mergeable sketches — approximate distinct counting at shuffle-free cost.

An exact COUNT(DISTINCT) is an all-to-all (`unique` shuffles every
key).  A HyperLogLog sketch replaces it with one vectorized pass:
each batch emits a fixed 2^p-byte register array, partials merge by
element-wise max (associative/commutative — any task tree works), and
the final estimate is computed from the merged registers.  At 100 TB
the shuffle payload becomes blocks × 4 KiB instead of the key universe.

Standard HLL per Flajolet et al. 2007 (public algorithm) with the
usual small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash_ints_u64, hash_strings_u64

DEFAULT_P = 12  # 4096 registers → ~1.6% standard error


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    typ = col.type if hasattr(col, "type") else None
    if typ is not None and (pa.types.is_integer(typ)):
        return hash_ints_u64(col)
    return hash_strings_u64(col)


def hll_partial(col, p: int = DEFAULT_P) -> np.ndarray:
    """One batch → its register array (uint8[2^p]).

    Nulls are excluded (COUNT(DISTINCT) semantics).  ``p`` is bounded to
    [12, 18]: below 12 the float64-log2 rho computation loses exactness
    (rem exceeds 2^52), above 18 the register array stops being 'tiny'.
    """
    if not (12 <= p <= 18):
        raise ValueError(f"p must be in [12, 18], got {p}")
    if hasattr(col, "drop_null"):
        col = col.drop_null()
    h = _hash_column(col)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h & np.uint64((1 << (64 - p)) - 1)
    # rho = position of the leftmost 1-bit in the low (64-p) bits
    # (64-p ≤ 52 ⇒ rem is exactly representable as float64 ⇒ log2 exact)
    with np.errstate(divide="ignore"):
        msb = np.floor(np.log2(rem.astype(np.float64))).astype(np.int64)
    rho = np.where(rem == 0, 64 - p + 1, (64 - p) - msb).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    return np.maximum.reduce(partials) if partials else np.zeros(1 << DEFAULT_P, np.uint8)


def hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return int(round(est))


def approx_distinct(ds, column: str, p: int = DEFAULT_P) -> int:
    """Approximate COUNT(DISTINCT column) over a Dataset.

    One vectorized map pass; only 2^p-byte partials reach the driver.
    """
    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch.column(column), p)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(pa.array(regs), len(regs))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    partials = [np.asarray(r["regs"], dtype=np.uint8) for r in rows]
    return hll_estimate(hll_merge(partials))
