"""Bloom-filter semijoin reduction for join chains.

A multi-hop join often scans a fact leg (lineitem) whose rows mostly
die at the next hop because their join key didn't survive the previous
hop (date-filtered orders).  Broadcasting the surviving KEY SET would
be exact but driver-materializes an unbounded object; a Bloom filter is
the scale path: FIXED size regardless of key count (1 MiB here), built
distributed (one partial filter per block, OR-folded on the driver —
the fold is over block-count × 1 MiB, never over keys), shipped once
via ``ray.put``, and probed vectorized per batch.

Correctness is unconditional: a false positive only lets a row through
to the join, which then drops it (the join is the exact filter); a true
key is never rejected.  At extreme key cardinality the FPR rises and
the reduction gracefully degrades toward no pruning — never toward
wrong results.

Two independent hashes per key (multiply-shift with distinct odd
constants over the 2^23-bit domain); deterministic, so repeated runs
build the identical filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_BLOOM_BITS_LOG2 = 23  # 2^23 bits = 1 MiB
_BLOOM_BYTES = (1 << _BLOOM_BITS_LOG2) // 8

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)
_SHIFT = np.uint64(64 - _BLOOM_BITS_LOG2)


def _bit_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.uint64)
    h1 = ((k * _H1) >> _SHIFT).astype(np.int64)
    h2 = ((k * _H2) >> _SHIFT).astype(np.int64)
    return h1, h2


def build_key_bloom(ds: ray.data.Dataset, col: str) -> "ray.ObjectRef":
    """Distributed build: per-block partial filters OR-folded on the
    driver, returned as a ``ray.put`` handle to the packed bit array."""

    def partial(block: pa.Table) -> pa.Table:
        bits = np.zeros(_BLOOM_BYTES, dtype=np.uint8)
        if block.num_rows:
            # drop_null BEFORE the numpy view: a null would degrade the
            # whole array to float64+NaN, where keys >2^53 round and
            # NaN→uint64 is undefined — silent hash drift vs the probe
            keys = np.asarray(
                block.column(col).cast(pa.int64()).combine_chunks().drop_null()
            )
            for h in _bit_positions(keys):
                np.bitwise_or.at(bits, h >> 3, (1 << (h & 7)).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    # stream the fold: take_all would hold every per-block 1 MiB blob on
    # the driver at once (block-count × 1 MiB transient); iter_batches
    # keeps exactly one batch of blobs alive while OR-folding
    folded = np.zeros(_BLOOM_BYTES, dtype=np.uint8)
    blobs = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    for b in blobs.iter_batches(batch_format="pyarrow", batch_size=8):
        for blob in b.column("bloom"):
            folded |= np.frombuffer(blob.as_buffer(), dtype=np.uint8)
    return ray.put(folded)


def bloom_member(keys: np.ndarray, bloom: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True where the key MAY be in the
    set (both bits set); definitely-absent keys return False."""
    h1, h2 = _bit_positions(keys)
    m1 = (bloom[h1 >> 3] >> (h1 & 7).astype(np.uint8)) & 1
    m2 = (bloom[h2 >> 3] >> (h2 & 7).astype(np.uint8)) & 1
    return (m1 & m2).astype(bool)
