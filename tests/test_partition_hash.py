"""Partitioner + hashing: stability, salt fan-out, key locality."""

import numpy as np
import pyarrow as pa

from nifi_processors_ray.functions.hashing import (
    engine_hash_fingerprint,
    hash_ints_u64,
    hash_strings_u64,
)
from nifi_processors_ray.stages.partition import (
    PARTITION_COL,
    add_partition_column,
    partition_of,
)


def test_hash_deterministic_across_calls():
    a = hash_strings_u64(pa.array(["x", "y", "z", None]))
    b = hash_strings_u64(pa.array(["x", "y", "z", None]))
    assert (a == b).all()
    assert engine_hash_fingerprint() == engine_hash_fingerprint()


def test_int_hash_spreads():
    h = hash_ints_u64(np.arange(1000))
    assert len(np.unique(h % 16)) == 16


def _table(conv_ids, turn_idxs):
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
        }
    )


def test_key_maps_to_single_partition():
    # same (conv, turn) key always lands on the same partition
    t = _table(["c1"] * 3 + ["c2"] * 3, [5, 5, 5, 7, 7, 7])
    parts = add_partition_column(t, 32, 4).column(PARTITION_COL).to_pylist()
    assert len(set(parts[:3])) == 1 and len(set(parts[3:])) == 1
    assert parts[0] == partition_of("c1", 5, 32, 4)


def test_salt_fans_hot_conversation():
    # one conv with many turns spreads over ~salt_factor partitions
    t = _table(["hot"] * 1000, list(range(1000)))
    parts = set(add_partition_column(t, 64, 8).column(PARTITION_COL).to_pylist())
    assert len(parts) == 8  # exactly S distinct partitions


def test_no_salt_keeps_conv_together():
    t = _table(["c9"] * 100, list(range(100)))
    parts = set(add_partition_column(t, 64, 1).column(PARTITION_COL).to_pylist())
    assert len(parts) == 1


def test_null_conv_id_routable():
    t = _table([None, None], [0, None])
    parts = add_partition_column(t, 8, 2).column(PARTITION_COL).to_pylist()
    assert all(0 <= p < 8 for p in parts)


def test_partition_balance():
    # 10k uniform keys over 32 partitions: no partition > 2x the mean
    conv = [f"conv-{i}" for i in range(10_000)]
    t = _table(conv, [0] * 10_000)
    parts = add_partition_column(t, 32, 4).column(PARTITION_COL).to_numpy()
    counts = np.bincount(parts, minlength=32)
    assert counts.max() < 2 * counts.mean()


def test_salting_bounds_macro_partition_skew():
    """Quantitative skew bound: with a conversation taking 20% of all
    events, salting must keep the largest partition well under the
    unsalted hot-spot share."""
    from nifi_processors_ray.synth import generate_changelog

    ch = generate_changelog(50_000, n_convs=500, hot_frac=0.2, invalid_frac=0.0)
    P = 32

    def max_share(salt):
        parts = add_partition_column(ch, P, salt).column(PARTITION_COL).to_numpy(
            zero_copy_only=False
        )
        counts = np.bincount(parts, minlength=P)
        return counts.max() / len(parts)

    unsalted = max_share(1)   # hot conv concentrated on one partition: ≥20%
    salted = max_share(8)     # fanned over 8 partitions
    assert unsalted > 0.2
    assert salted < 0.1, f"salted max share {salted}"


def test_read_side_pruning_matches_writer_placement():
    """partitions_for_conv (the read-side pruning rule) must contain the
    writer's placement for EVERY (conv, turn): one shared uint64 formula
    — Python-int arithmetic diverges on hash wraparound near 2^64."""
    import numpy as np
    import pyarrow as pa

    from nifi_processors_ray.stages.partition import (
        add_partition_column,
        partitions_for_conv,
    )

    rng = np.random.default_rng(7)
    convs = [f"conv-{i}-{rng.integers(1e9)}" for i in range(200)]
    for P, S in ((13, 5), (16, 4), (7, 1), (257, 9)):
        batch = pa.table(
            {
                "conv_id": pa.array([c for c in convs for _ in range(3)]),
                "turn_idx": pa.array(
                    [int(t) for _ in convs for t in rng.integers(0, 1000, 3)],
                    pa.int32(),
                ),
            }
        )
        placed = add_partition_column(batch, P, S)
        for conv, part in zip(
            placed.column("conv_id").to_pylist(), placed.column("__part").to_pylist()
        ):
            allowed = partitions_for_conv(conv, P, S)
            assert part in allowed, (conv, part, allowed, P, S)
