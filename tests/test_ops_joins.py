"""Unit tests for the join primitives (ops/joins.py) — hand-crafted edge
cases; end-to-end SQL parity is covered by test_oracle_dtype_parity."""

import numpy as np
import pyarrow as pa

from nifi_processors_ray.ops import joins as J


def _block(rows):
    """rows: (key, side, priority, cents) — probe rows get partial n=1."""
    return pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "side": pa.array([r[1] for r in rows], pa.int8()),
            "priority": pa.array([r[2] for r in rows], pa.string()),
            "cents": pa.array([r[3] for r in rows], pa.int64()),
            "n": pa.array([1 if r[1] == 1 else None for r in rows], pa.int64()),
        }
    )


def test_join_block_matches_and_orphans():
    # key 1: build + 2 probes; key 2: probe with NO build (dropped, inner
    # join); key 3: build with no probes (contributes nothing)
    block = _block(
        [
            (1, 0, "HI", None),
            (1, 1, None, 10),
            (1, 1, None, 5),
            (2, 1, None, 99),
            (3, 0, "LO", None),
        ]
    )
    out = J._join_block_partials(block).to_pylist()
    assert out == [{"priority": "HI", "n_items": 2, "revenue_cents": 15}]


def test_join_block_unsorted_input_is_sorted_locally():
    # co-location guarantees same-block, not intra-block order
    block = _block(
        [
            (1, 1, None, 7),
            (1, 0, "HI", None),
        ]
    )
    out = J._join_block_partials(block).to_pylist()
    assert out == [{"priority": "HI", "n_items": 1, "revenue_cents": 7}]


def test_join_block_empty():
    assert J._join_block_partials(_block([])).num_rows == 0


def test_rank_block_orders_within_group():
    block = pa.table(
        {
            "o_custkey": pa.array([7, 7, 7, 7, 9], pa.int64()),
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "price_cents": pa.array([50, 80, 80, 10, 30], pa.int64()),
        }
    )
    out = J._rank_block(block, n_top=3).to_pylist()
    # cust 7: price desc, tie on 80 broken by orderkey asc → 2, 3, then 50
    assert [(r["o_custkey"], r["o_orderkey"], r["rn"]) for r in out] == [
        (7, 2, 1),
        (7, 3, 2),
        (7, 1, 3),
        (9, 5, 1),
    ]


def test_band_partials_edges():
    batch = pa.table(
        {
            # 1 → q1 (inclusive lo); 12.99 → q1; 13 → q2 (exclusive hi);
            # 50.9 → q4; 51 → out of range; 0.5 → below all bands
            "l_quantity": pa.array([1.0, 12.99, 13.0, 50.9, 51.0, 0.5]),
            "l_extendedprice": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0]),
        }
    )
    out = {r["band"]: (r["n_rows"], r["price_cents"]) for r in J._band_partials(batch).to_pylist()}
    assert out == {"q1": (2, 300), "q2": (1, 400), "q4": (1, 800)}


def test_anti_join_has_signal_at_test_sf(ray_session):
    # SQL parity is covered by test_oracle_dtype_parity; here: the op
    # actually returns a non-trivial anti set on the test corpus
    got = J.customers_without_orders("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 18  # customers with no URGENT order at sf0.001


def test_anti_block_keeps_only_unmatched_left():
    from nifi_processors_ray.ops.joins import _anti_block

    block = pa.table(
        {
            "key": pa.array([1, 1, 2, 3, 3, 3, 4], pa.int64()),
            "side": pa.array([0, 1, 0, 0, 0, 1, 1], pa.int8()),
            "c_name": pa.array(["a", None, "b", "c", "c2", None, None]),
        }
    )
    out = _anti_block(block).to_pandas()
    # key 1: matched (dropped); key 2: no right row (kept); key 3: two
    # left rows, matched (both dropped); key 4: right-only (nothing kept)
    assert list(out["c_custkey"]) == [2] and list(out["c_name"]) == ["b"]


def test_exists_block_semi_vs_anti_partition():
    """Semi and anti masks over the same block partition the left rows."""
    block = pa.table(
        {
            "key": pa.array([1, 1, 2, 3, 3], pa.int64()),
            "side": pa.array([0, 1, 0, 0, 1], pa.int8()),
            "c_name": pa.array(["a", None, "b", "c", None], pa.string()),
        }
    )
    semi = J._exists_block(block, want_right=True).to_pydict()
    anti = J._exists_block(block, want_right=False).to_pydict()
    assert semi["c_custkey"] == [1, 3]  # keys whose run has a right row
    assert anti["c_custkey"] == [2]
    n_left = 3
    assert len(semi["c_custkey"]) + len(anti["c_custkey"]) == n_left


def test_intersect_block_both_sides_required():
    block = pa.table(
        {
            "key": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
            "side": pa.array([0, 1, 0, 1, 1, 0], pa.int8()),
        }
    )
    out = J._intersect_block(block).to_pydict()
    # key 2 is left-only; key 3 has duplicate right rows but emits once
    assert out["custkey"] == [1, 3]


def test_brand_sides_share_join_block_schema():
    """The brand join reuses _join_block_partials: both side projections
    must emit the exact internal exchange schema, and a crafted block
    must aggregate to the right brand partials."""
    import numpy as np
    import pyarrow as pa

    parts = pa.table(
        {"p_partkey": pa.array([1, 2], pa.int64()), "p_brand": pa.array(["B1", "B2"])}
    )
    items = pa.table(
        {
            "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),  # 3 = dangling fk
            "l_extendedprice": pa.array([10.0, 20.0, 5.0, 99.0]),
            "l_discount": pa.array([0.0, 0.5, 0.0, 0.0]),
        }
    )
    left = J._part_side(parts)
    right = J._lineitem_part_side(items)
    assert left.schema.names == right.schema.names == ["key", "side", "priority", "cents", "n"]
    block = pa.concat_tables([left, right])
    out = J._join_block_partials(block)
    d = {b: (n, c) for b, n, c in zip(
        out.column("priority").to_pylist(),
        out.column("n_items").to_pylist(),
        out.column("revenue_cents").to_pylist(),
    )}
    assert d == {"B1": (2, 2000), "B2": (1, 500)}  # 1000+1000, 500; key 3 dropped


def test_except_block_mask():
    block = pa.table(
        {
            # key 1: both sides -> dropped; key 2: left only -> kept;
            # key 3: right only -> dropped
            "key": pa.array([1, 1, 2, 3], pa.int64()),
            "side": pa.array([0, 1, 0, 1], pa.int8()),
        }
    )
    out = J._except_block(block)
    assert out.column("custkey").to_pylist() == [2]


def test_left_outer_block_zero_fills_and_sums_partials():
    block = pa.concat_tables(
        [
            J._cust_left_side(
                pa.table(
                    {"c_custkey": pa.array([1, 2], pa.int64()),
                     "c_name": pa.array(["A", "B"])}
                )
            ),
            # two right PARTIALS for key 1 (as if from two batches), none for 2,
            # and a dangling right key 9 with no left row (must vanish)
            pa.table(
                {
                    "key": pa.array([1, 1, 9], pa.int64()),
                    "side": pa.array([1, 1, 1], pa.int8()),
                    "c_name": pa.nulls(3, pa.string()),
                    "cents": pa.array([100, 250, 7], pa.int64()),
                    "n": pa.array([2, 1, 1], pa.int64()),
                }
            ),
        ]
    )
    out = J._left_outer_block(block)
    assert out.column("c_custkey").to_pylist() == [1, 2]
    assert out.column("n_orders").to_pylist() == [3, 0]
    assert out.column("spend_cents").to_pylist() == [350, 0]
    assert out.column("c_name").to_pylist() == ["A", "B"]


def test_full_outer_block_keeps_both_dangling_sides():
    block = pa.concat_tables(
        [
            J._cust_left_side(
                pa.table(
                    {"c_custkey": pa.array([1, 2], pa.int64()),
                     "c_name": pa.array(["A", "B"])}
                )
            ),
            # two right partials for key 1, none for key 2 (left-only -> 0),
            # and a right-only key 9 (must SURVIVE with NULL name)
            pa.table(
                {
                    "key": pa.array([1, 1, 9], pa.int64()),
                    "side": pa.array([1, 1, 1], pa.int8()),
                    "c_name": pa.nulls(3, pa.string()),
                    "cents": pa.nulls(3, pa.int64()),
                    "n": pa.array([4, 1, 6], pa.int64()),
                }
            ),
        ]
    )
    out = J._full_outer_block(block)
    assert out.column("custkey").to_pylist() == [1, 2, 9]
    assert out.column("n_events").to_pylist() == [5, 0, 6]
    assert out.column("c_name").to_pylist() == ["A", "B", None]


def test_full_outer_block_empty_is_schema_stable():
    out = J._full_outer_block(
        pa.table(
            {
                "key": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "c_name": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    )
    assert out.num_rows == 0
    assert out.schema.names == ["custkey", "c_name", "n_events"]


def test_set_side_drops_null_keys():
    # null keys are excluded from the set-op domain (the twins filter
    # them too) — a null would NaN-split in the block kernel and its
    # int64 cast is undefined
    batch = pa.table({"user_id": pa.array([1, None, 2, 1], pa.int64())})
    out = J._set_side("user_id", 1)(batch)
    assert sorted(out.column("key").to_pylist()) == [1, 2]
