"""HyperLogLog sketch accuracy + merge semantics."""

import numpy as np
import pyarrow as pa
import ray.data

from nifi_processors_ray.functions import sketches as S

SF_DIR = "/root/testdata/sf0.001"


def test_small_range_is_near_exact():
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    exact = len(set(r["user_id"] for r in ds.take_all()))
    est = S.approx_distinct(ds, "user_id")
    assert est == exact  # linear-counting regime: 15 distinct of 4096 regs


def test_high_cardinality_within_error_bound():
    n = 200_000
    vals = pa.table({"k": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(vals)
    est = S.approx_distinct(ds, "k")
    assert abs(est - n) / n < 0.05  # 3σ of the 1.6% standard error


def test_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50_000, 100_000)
    b = rng.integers(25_000, 75_000, 100_000)
    pa_a, pa_b = pa.array(a), pa.array(b)
    merged = S.hll_merge([S.hll_partial(pa_a), S.hll_partial(pa_b)])
    single = S.hll_partial(pa.array(np.concatenate([a, b])))
    assert (merged == single).all()
    exact = len(set(a) | set(b))
    assert abs(S.hll_estimate(merged) - exact) / exact < 0.05


def test_string_column_support():
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array([f"doc-{i % 1000}" for i in range(10_000)])})
    )
    est = S.approx_distinct(ds, "s")
    assert abs(est - 1000) / 1000 < 0.05
