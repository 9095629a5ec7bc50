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
