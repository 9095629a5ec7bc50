"""Multi-hop join chains (ops/chains.py): Q5/Q10 shapes.

DuckDB value parity is pinned for every twin by
tests/test_oracle_dtype_parity.py; this file covers the edges that
parity on well-formed testdata can't reach: empty predicate windows
(schema-stable zero-row results) and result-shape contracts.
"""

from __future__ import annotations

import pandas as pd
import pytest

from nifi_processors_ray.ops import chains

SF = "/root/testdata/sf0.001"


def test_q5_result_shape(ray_session):
    df = chains.local_supplier_volume(SF).to_pandas()
    assert list(df.columns) == ["n_name", "revenue_cents"]
    assert (df["revenue_cents"] > 0).all()
    # ordered by revenue desc (name tiebreak)
    assert (df["revenue_cents"].diff().dropna() <= 0).all()


def test_q5_empty_window_is_schema_stable(ray_session, monkeypatch):
    """A predicate window with no orders must yield ZERO rows with the
    full output schema — not a schema-less empty block (the
    RefBundle-schema-drift class VERDICT r2 flagged on training_mix)."""
    monkeypatch.setattr(chains, "Q5_LO", "1990-01-01")
    monkeypatch.setattr(chains, "Q5_HI", "1990-02-01")
    ds = chains.local_supplier_volume(SF)
    # NOTE: Ray 2.49's to_pandas() drops columns on an all-empty dataset
    # even when the block schema is pinned — assert the dataset schema,
    # which is what downstream Ray stages see.
    assert ds.schema().names == ["n_name", "revenue_cents"]
    assert ds.count() == 0


def test_q10_top_k_and_order(ray_session):
    df = chains.returned_item_revenue(SF, n_top=5).to_pandas()
    assert list(df.columns) == ["c_custkey", "c_name", "n_name", "revenue_cents"]
    assert len(df) == 5
    assert (df["revenue_cents"].diff().dropna() <= 0).all()
    # every labeled nation resolved (customer.nationkey is a valid FK here)
    assert df["n_name"].notna().all()


def test_q10_empty_window_is_schema_stable(ray_session, monkeypatch):
    monkeypatch.setattr(chains, "Q10_LO", "1990-01-01")
    monkeypatch.setattr(chains, "Q10_HI", "1990-02-01")
    ds = chains.returned_item_revenue(SF)
    assert ds.schema().names == ["c_custkey", "c_name", "n_name", "revenue_cents"]
    assert ds.count() == 0


def test_bloom_semijoin_reduction_properties(ray_session):
    """No false negatives ever (correctness), and the fixed-size filter
    actually prunes (power): ≥99% of foreign keys rejected at this
    cardinality."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from nifi_processors_ray.functions.bloom import bloom_member, build_key_bloom

    keys = np.arange(0, 50_000, 2, dtype=np.int64)  # 25k even keys
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    bloom = ray.get(build_key_bloom(ds, "k"))
    assert bloom_member(keys, bloom).all()  # zero false negatives
    foreign = np.arange(1, 50_000, 2, dtype=np.int64)  # odd keys, absent
    fpr = bloom_member(foreign, bloom).mean()
    assert fpr < 0.01, f"false-positive rate {fpr} too high for 25k keys/1MiB"


def test_q5_result_identical_with_and_without_bloom(ray_session):
    """The semijoin reduction must be invisible in the result.  The
    disable path is threaded through fn_kwargs (``use_bloom=False`` →
    no bloom_ref reaches the worker) — a driver-side monkeypatch of
    ``bloom_member`` would NOT reach Ray worker processes (the UDF is
    re-imported there), which made the first version of this test
    vacuous (round-3 review finding)."""
    with_bloom = chains.local_supplier_volume(SF).to_pandas()
    without = chains.local_supplier_volume(SF, use_bloom=False).to_pandas()
    assert with_bloom.equals(without)
    assert len(with_bloom) > 0


def test_q10_result_identical_with_and_without_bloom(ray_session):
    with_bloom = chains.returned_item_revenue(SF).to_pandas()
    without = chains.returned_item_revenue(SF, use_bloom=False).to_pandas()
    assert with_bloom.equals(without)
    assert len(with_bloom) > 0


def test_bloom_probe_drops_null_keys_without_degrading(ray_session):
    """A null l_orderkey must neither crash the probe nor degrade the
    key array to float64 (the round-3 second-review finding): null-key
    rows are dropped with the bloom misses (INNER-join semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from nifi_processors_ray.functions.bloom import build_key_bloom
    from nifi_processors_ray.ops.chains import _q5_lineitem_side

    keys = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    bloom = ray.get(build_key_bloom(ray.data.from_arrow(keys), "k"))
    batch = pa.table(
        {
            "l_orderkey": pa.array([1, None, 2, 999], pa.int64()),
            "l_suppkey": pa.array([7, 7, 7, 7], pa.int64()),
            "l_extendedprice": pa.array([10.0, 10.0, 10.0, 10.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        }
    )
    out = _q5_lineitem_side(batch, bloom_ref=bloom)
    assert sorted(out.column("key").to_pylist()) == [1, 2]  # null + miss dropped
