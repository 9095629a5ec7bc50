"""Salted hash partitioner — the shard-routing analog.

The reference routes records to shards by partition key with a RANDOM
fallback key to spread unkeyed load (``producer/PutKinesisStream.java:
264-271``).  A lake cannot use random placement: a key's partition must
be a pure, stable function of the key so that copy-on-write merge finds
the key's prior state, and so that a resumed run (actor restart = lease
failover) lands keys where the manifest says they are.

Design: ``partition(conv_id, turn_idx) = (H(conv_id) + H(turn_idx) % S) % P``

- ``H(conv_id)`` alone would put a hot conversation (the skew scenario:
  one conv with ~10^3× the median turns) entirely on one partition.
- The additive salt ``H(turn_idx) % S`` fans every conversation over
  ``min(S, P)`` partitions, bounding any conversation's share of a
  partition to ~1/S of its total volume — a STATIC salt, deterministic
  per key, so no commit-time key migration is ever needed.  "Re-merging
  the salted shards" happens at read time: consumers sort by
  ``(conv_id, turn_idx)`` (the stable-order invariant), which
  interleaves a conversation's S sub-shards back into one sequence.
- Since each ``(conv_id, turn_idx)`` key maps to exactly ONE partition,
  last-writer-wins stays a purely partition-local decision.

Rows already marked rejected keep flowing (they are routed by the same
function, null conv_id hashing to a constant) so the merge stage can
write them to the rejected side table under the same exactly-once
commit as the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_ints_u64, hash_strings_u64

PARTITION_COL = "__part"


def add_partition_column(batch: pa.Table, num_partitions: int, salt_factor: int) -> pa.Table:
    h_conv = hash_strings_u64(batch.column("conv_id"))
    turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
    if turn.dtype.kind == "f":  # nulls (already-rejected rows) surface as NaN → salt 0
        turn = np.nan_to_num(turn).astype(np.int64)
    else:
        turn = turn.astype(np.int64, copy=False)
    salt = hash_ints_u64(turn) % np.uint64(max(1, salt_factor))
    part = ((h_conv + salt) % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(PARTITION_COL, pa.array(part, type=pa.int32()))


def partitions_for_conv(conv_ids, num_partitions: int, salt_factor: int) -> set[int]:
    """Every partition rows of these conv_ids can land in — the read-side
    pruning rule (point lookups, view refresh).  MUST use the same
    uint64 WRAPPING arithmetic as :func:`add_partition_column`: a Python
    ``(int(h) + s) % P`` diverges for hashes within ``salt_factor`` of
    2^64 when P is not a power of two (the sum wraps mod 2^64 in the
    writer, not in unbounded ints), silently pruning away the partition
    that actually holds the rows.  This helper is the single home of
    the formula's read side."""
    if isinstance(conv_ids, str):
        conv_ids = [conv_ids]
    h = hash_strings_u64(pa.array(list(conv_ids), pa.string()))
    P = np.uint64(num_partitions)
    parts: set[int] = set()
    for s in range(min(max(1, salt_factor), num_partitions)):
        parts.update(((h + np.uint64(s)) % P).tolist())
    return parts


def partition_of(conv_id: str, turn_idx: int, num_partitions: int, salt_factor: int) -> int:
    """Scalar twin of ``add_partition_column`` (tests / point lookups)."""
    t = add_partition_column(
        pa.table(
            {
                "conv_id": pa.array([conv_id], pa.string()),
                "turn_idx": pa.array([turn_idx], pa.int32()),
            }
        ),
        num_partitions,
        salt_factor,
    )
    return t.column(PARTITION_COL)[0].as_py()
