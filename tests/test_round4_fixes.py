"""Regression pins for the round-3 ADVICE items (round 4)."""

import numpy as np
import pyarrow as pa
import pytest


def test_grouped_reduce_kernel_empty_block_is_plan_shaped():
    """An empty block must come back agg-shaped (skeys + alias columns),
    not as the raw pre-agg block whose schema would drift unification."""
    from nifi_processors_ray.functions.debug import _grouped_reduce_kernel

    kernel = _grouped_reduce_kernel(["k"], [("sum", "v", "total"), ("count", None, "n")])
    empty = pa.table(
        {"k": pa.array([], pa.string()), "v": pa.array([], pa.int64()),
         "extra": pa.array([], pa.string())}
    )
    out = kernel(empty)
    assert out.column_names == ["k", "total", "n"]
    assert out.num_rows == 0
    assert out.schema.field("total").type == pa.int64()


def test_vector_agg_plan_falls_back_without_private_attr():
    """If a future Ray drops _ignore_nulls, Count(on=col) must fall back
    to Ray's operator, not silently count all rows."""
    from ray.data.aggregate import Count

    from nifi_processors_ray.functions.debug import _vector_agg_plan

    c = Count(on="v", alias_name="n", ignore_nulls=True)
    assert _vector_agg_plan([c], {"n": pa.int64()}) is not None
    assert "_ignore_nulls" in c.__dict__  # the attr this fallback guards
    del c._ignore_nulls
    assert _vector_agg_plan([c], {"n": pa.int64()}) is None


def test_grouped_approx_distinct_keeps_all_null_value_groups(ray_session):
    """A group present in the data whose values are ALL NULL must emit
    approx=0 (SQL GROUP BY + COUNT(DISTINCT) semantics), not vanish."""
    import ray.data

    from nifi_processors_ray.functions.sketches import grouped_approx_distinct

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "b", "b", None], pa.string()),
            "v": pa.array([1, 2, None, None, 7], pa.int64()),
        }
    )
    out = (
        grouped_approx_distinct(ray.data.from_arrow(tbl), "g", "v")
        .to_pandas()
        .sort_values("g", na_position="first")
        .reset_index(drop=True)
    )
    got = {(None if g is not g or g is None else g): int(a)
           for g, a in zip(out["g"].where(out["g"].notna(), None), out["approx"])}
    assert got == {"a": 2, "b": 0, None: 1}


def test_jaccard_rejects_unknown_kwargs(ray_session):
    import ray.data

    from nifi_processors_ray.ops.dedup import jaccard_dup_pairs

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c", "a b c"], pa.string())})
    )
    with pytest.raises(TypeError, match="unexpected keyword"):
        jaccard_dup_pairs(docs, max_bucket=4)  # typo'd / unsupported kwarg
