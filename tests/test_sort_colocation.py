"""Guard the load-bearing Ray invariant behind all blockwise group ops.

``exact_dedup``, ``_pairs_blockwise`` and the merge stage's group
handling all assume that after ``Dataset.sort(key)`` a run of EQUAL key
values never straddles two output blocks (Ray's range partitioner
assigns ties to one side consistently).  If a Ray upgrade ever broke
that, those operators would silently emit duplicates/missed pairs —
this test turns that into a loud failure.
"""

import numpy as np
import pyarrow as pa
import ray.data


def test_sorted_equal_keys_never_straddle_blocks():
    rng = np.random.default_rng(0)
    # 50k rows, only 40 distinct keys, 64 input blocks → ties at every boundary
    keys = rng.integers(0, 40, size=50_000)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(np.arange(50_000))})
    )
    ds = ds.repartition(64).sort("k")

    def block_keys(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("k"))
        return pa.table({"uniq": [[int(x) for x in np.unique(ks)]]})

    blocks = ds.map_batches(block_keys, batch_format="pyarrow", batch_size=None).take_all()
    owner: dict[int, int] = {}
    for i, b in enumerate(blocks):
        for k in b["uniq"]:
            assert owner.setdefault(k, i) == i, f"key {k} straddles blocks"
    assert sum(len(b["uniq"]) for b in blocks) == 40


# ---------------------------------------------------------------------------
# debug-flag runtime guard (functions/debug.py)
# ---------------------------------------------------------------------------

def test_colocation_checker_accepts_clean_blocks(ray_session):
    import pyarrow as pa
    import ray.data

    from nifi_processors_ray.functions.debug import check_sort_colocation

    t1 = pa.table({"k": pa.array([1, 1, 2], pa.int64())})
    t2 = pa.table({"k": pa.array([3, 4, 4], pa.int64())})
    check_sort_colocation(ray.data.from_arrow([t1, t2]), ["k"])  # no raise


def test_colocation_checker_catches_split_run(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from nifi_processors_ray.functions.debug import check_sort_colocation

    t1 = pa.table({"k": pa.array([1, 2, 2], pa.int64())})
    t2 = pa.table({"k": pa.array([2, 3], pa.int64())})  # run of 2 straddles
    with pytest.raises(AssertionError, match="split an equal-key run"):
        check_sort_colocation(ray.data.from_arrow([t1, t2]), ["k"])


def test_exact_dedup_under_debug_flag(ray_session, monkeypatch):
    """End-to-end with the guard armed: same result, no false positive."""
    from nifi_processors_ray.functions.debug import ENV_FLAG
    from nifi_processors_ray.ops.dedup import exact_dedup

    plain = exact_dedup("/root/testdata/sf0.001").to_pandas()
    monkeypatch.setenv(ENV_FLAG, "1")
    checked = exact_dedup("/root/testdata/sf0.001").to_pandas()
    assert plain.equals(checked)
