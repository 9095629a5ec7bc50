"""Regression pins for the fourth-review findings (fast-groupby and
subqueries edges)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from nifi_processors_ray.functions.debug import (
    _vector_agg_plan,
    null_safe_groupby_agg,
)


def _agg_rows(ds, keys, *aggs, **kw):
    out = null_safe_groupby_agg(ds, keys, *aggs, **kw).to_pandas()
    return out.sort_values(out.columns.tolist()).reset_index(drop=True)


def test_fast_path_disabled_with_colocation_guard_off(ray_session, monkeypatch):
    """NPR_DEBUG_COLOCATION=0 disables the run repair, so a split hot
    run would make the reduceat kernel emit duplicate group rows; the
    fast path must fall back to Ray's split-agnostic operator and keep
    ONE row per key."""
    monkeypatch.setenv("NPR_DEBUG_COLOCATION", "0")
    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # force splits of the hot run
    try:
        n = 50_000
        t = pa.table(
            {
                "k": pa.array(np.zeros(n, np.int64)),  # ONE hot key
                "v": pa.array(np.ones(n, np.int64)),
            }
        )
        ds = ray.data.from_arrow(t).repartition(8)
        df = _agg_rows(
            ds, "k", Sum("v", alias_name="v"), out_types={"v": pa.int64()}
        )
    finally:
        ctx.target_max_block_size = prev
    assert len(df) == 1
    assert int(df["v"][0]) == n


def test_count_on_column_respects_ignore_nulls_default():
    """Ray 2.49's Count(on=col) defaults to ignore_nulls=False (counts
    null rows too); the plan must normalize that to a row count, not a
    non-null count."""
    plan = _vector_agg_plan((Count(on="v", alias_name="n"),), None)
    assert plan == [("count", None, "n")]
    plan = _vector_agg_plan((Count(on="v", ignore_nulls=True, alias_name="n"),), None)
    assert plan == [("count", "v", "n")]


def test_sum_ignore_nulls_false_keeps_ray_operator():
    plan = _vector_agg_plan(
        (Sum("v", ignore_nulls=False, alias_name="v"),), {"v": pa.int64()}
    )
    assert plan is None


def test_count_fast_path_counts_null_rows(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "v": pa.array([1, None, 3, None], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    df = _agg_rows(ds, "k", Count(on="v", alias_name="n"))
    assert df["n"].tolist() == [3, 1]  # nulls counted (Ray default)
    df2 = _agg_rows(ds, "k", Count(on="v", ignore_nulls=True, alias_name="n"))
    assert df2["n"].tolist() == [2, 0]


def test_nan_float_key_groups_as_one_run(ray_session):
    """pc.not_equal(NaN, NaN) is true; the kernel must not shred the
    NaN key run into per-row groups (Count-only plans are fast-path
    eligible for any key type)."""
    t = pa.table(
        {
            "k": pa.array([np.nan, np.nan, 1.0, np.nan], pa.float64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    df = _agg_rows(ds, "k", Count(alias_name="n"))
    assert sorted(df["n"].tolist()) == [1, 3]


def test_min_max_all_null_group_is_null(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([None, None, 5], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    df = _agg_rows(
        ds,
        "k",
        Min("v", alias_name="lo"),
        Max("v", alias_name="hi"),
        out_types={"lo": pa.int64(), "hi": pa.int64()},
    )
    assert df["lo"].isna().tolist() == [True, False]
    assert df["hi"].tolist()[1] == 5


def test_q21_kernel_handles_negative_supplier_keys():
    """The lone-returned-supplier extraction must not lose a win to the
    absent-sentinel when supplier keys are non-positive."""
    from nifi_processors_ray.ops import subqueries as subq

    block = pa.table(
        {
            "key": pa.array([1, 1, 1], pa.int64()),
            "side": pa.array([0, 1, 1], pa.int8()),
            "supp": pa.array([None, -5, 3], pa.int64()),
            "ret": pa.array([None, True, False], pa.bool_()),
        }
    )
    out = subq._q21_block(block)
    assert out.column("supp").to_pylist() == [-5]
    assert out.column("n").to_pylist() == [1]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_path_matches_ray_operator_fuzz(ray_session, seed):
    """Randomized parity: the reduceat fast path must agree with Ray's
    Aggregate operator on null-bearing keys AND values, including
    all-null groups, across Sum/Min/Max/Count."""
    rng = np.random.default_rng(seed)
    n = 5_000
    keys = rng.integers(-3, 40, n)
    key_arr = pa.array(
        [None if rng.random() < 0.07 else int(k) for k in keys], pa.int64()
    )
    val_arr = pa.array(
        [None if rng.random() < 0.2 else int(v) for v in rng.integers(-100, 100, n)],
        pa.int64(),
    )
    ds = ray.data.from_arrow(pa.table({"k": key_arr, "v": val_arr})).repartition(7)
    aggs = lambda: (  # noqa: E731
        Sum("v", alias_name="s"),
        Min("v", alias_name="lo"),
        Max("v", alias_name="hi"),
        Count(alias_name="n"),
    )
    out_types = {"s": pa.int64(), "lo": pa.int64(), "hi": pa.int64()}
    fast = _agg_rows(ds, "k", *aggs(), out_types=out_types)
    # force the slow path by adding a disqualifying aggregate, then drop it
    from ray.data.aggregate import Mean

    slow = null_safe_groupby_agg(
        ds, "k", *aggs(), Mean("v", alias_name="_m"), out_types=out_types
    ).to_pandas()
    slow = slow.drop(columns=["_m"]).sort_values(slow.columns.drop("_m").tolist()).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
