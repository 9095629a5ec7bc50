"""Correlated-subquery / quantifier shapes (ops/subqueries.py):
Q17 / Q21 / Q22 / Q7 / Q14 analogues.

DuckDB value parity on well-formed testdata is pinned for every twin by
tests/test_oracle_dtype_parity.py; this file covers what that can't
reach: empty predicate windows (schema-stable results, SQL SUM-of-empty
NULL semantics), bloom-reduction invisibility, and null-injected join
keys / measures against the twins on the SAME corrupted tables.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry
from nifi_processors_ray.ops import subqueries as subq

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# result shapes and orderings
# ---------------------------------------------------------------------------


def test_q17_shape(ray_session):
    t = subq.small_qty_part_revenue(SF)
    assert t.schema.names == ["n_small", "revenue_cents"]
    assert t.num_rows == 1
    assert t.column("n_small")[0].as_py() > 0
    assert t.column("revenue_cents")[0].as_py() > 0


def test_q17_empty_brand_yields_zero_and_null_sum(ray_session, monkeypatch):
    """SQL over an empty qualifying set: COUNT(*) = 0, SUM = NULL."""
    monkeypatch.setattr(subq, "Q17_BRAND", "Brand#none-such")
    t = subq.small_qty_part_revenue(SF)
    assert t.num_rows == 1
    assert t.column("n_small")[0].as_py() == 0
    assert t.column("revenue_cents")[0].as_py() is None


def test_q17_bloom_is_invisible(ray_session):
    a = subq.small_qty_part_revenue(SF, use_bloom=True)
    b = subq.small_qty_part_revenue(SF, use_bloom=False)
    assert a.equals(b)


def test_q21_shape_and_order(ray_session):
    df = subq.sole_returned_supplier(SF).to_pandas()
    assert list(df.columns) == ["s_suppkey", "s_name", "numwait"]
    assert len(df) > 0
    assert (df["numwait"].diff().dropna() <= 0).all()


def test_q21_empty_status_is_schema_stable(ray_session, monkeypatch):
    monkeypatch.setattr(subq, "Q21_STATUS", "Z")
    ds = subq.sole_returned_supplier(SF)
    assert ds.schema().names == ["s_suppkey", "s_name", "numwait"]
    assert ds.count() == 0


def test_q22_shape(ray_session):
    df = subq.idle_rich_customers(SF).to_pandas()
    assert list(df.columns) == ["c_nationkey", "n_cust", "bal_cents"]
    assert len(df) > 0
    assert (df["n_cust"] > 0).all()


def test_q22_everyone_active_is_schema_stable(ray_session, monkeypatch):
    """With the cutoff before the first order, every customer has a
    recent order — zero rows, full schema."""
    monkeypatch.setattr(subq, "Q22_CUTOFF", "1994-01-01")
    ds = subq.idle_rich_customers(SF)
    assert ds.schema().names == ["c_nationkey", "n_cust", "bal_cents"]
    assert ds.count() == 0


def test_q7_shape_and_bloom_invisible(ray_session):
    a = subq.nation_pair_volume(SF, use_bloom=True).to_pandas()
    b = subq.nation_pair_volume(SF, use_bloom=False).to_pandas()
    assert list(a.columns) == ["supp_nation", "cust_nation", "l_year", "revenue_cents"]
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_q7_empty_window_is_schema_stable(ray_session, monkeypatch):
    monkeypatch.setattr(subq, "Q7_LO", "1990-01-01")
    monkeypatch.setattr(subq, "Q7_HI", "1990-02-01")
    ds = subq.nation_pair_volume(SF)
    assert ds.schema().names == ["supp_nation", "cust_nation", "l_year", "revenue_cents"]
    assert ds.count() == 0


def test_q14_shape(ray_session):
    t = subq.promo_revenue_share(SF)
    assert t.schema.names == ["promo_cents", "total_cents"]
    assert t.num_rows == 1
    promo, total = t.column("promo_cents")[0].as_py(), t.column("total_cents")[0].as_py()
    assert 0 < promo < total


def test_q14_empty_window_yields_null_sums(ray_session, monkeypatch):
    monkeypatch.setattr(subq, "Q14_LO", "1990-01-01")
    monkeypatch.setattr(subq, "Q14_HI", "1990-02-01")
    t = subq.promo_revenue_share(SF)
    assert t.num_rows == 1
    assert t.column("promo_cents")[0].as_py() is None
    assert t.column("total_cents")[0].as_py() is None


def test_q19_shape(ray_session):
    t = subq.disjunctive_band_revenue(SF)
    assert t.schema.names == ["n_items", "revenue_cents"]
    assert t.num_rows == 1
    assert t.column("n_items")[0].as_py() > 0
    assert t.column("revenue_cents")[0].as_py() > 0


def test_q19_bloom_is_invisible(ray_session):
    a = subq.disjunctive_band_revenue(SF, use_bloom=True)
    b = subq.disjunctive_band_revenue(SF, use_bloom=False)
    assert a.equals(b)


def test_q19_empty_bands_yield_zero_and_null_sum(ray_session, monkeypatch):
    monkeypatch.setattr(
        subq, "Q19_BANDS", (("Brand#none-such", 1, 1, 1, 1),)
    )
    t = subq.disjunctive_band_revenue(SF)
    assert t.num_rows == 1
    assert t.column("n_items")[0].as_py() == 0
    assert t.column("revenue_cents")[0].as_py() is None


def test_q8_shape_and_bloom_invisible(ray_session):
    a = subq.nation_market_share(SF, use_bloom=True).to_pandas()
    b = subq.nation_market_share(SF, use_bloom=False).to_pandas()
    assert list(a.columns) == ["o_year", "target_cents", "total_cents"]
    assert len(a) > 0
    assert (a["target_cents"] <= a["total_cents"]).all()
    pd.testing.assert_frame_equal(a, b)


def test_q8_unknown_type_is_schema_stable(ray_session, monkeypatch):
    monkeypatch.setattr(subq, "Q8_TYPE", "NO-SUCH-TYPE")
    ds = subq.nation_market_share(SF)
    assert ds.schema().names == ["o_year", "target_cents", "total_cents"]
    assert ds.count() == 0


def test_q8_out_of_region_nation_has_zero_share(ray_session, monkeypatch):
    """A target nation OUTSIDE the region never supplies a flagged row
    — target_cents must be identically zero, totals unchanged."""
    base = subq.nation_market_share(SF).to_pandas()
    monkeypatch.setattr(subq, "Q8_NATION", "NO-SUCH-NATION")
    off = subq.nation_market_share(SF).to_pandas()
    assert (off["target_cents"] == 0).all()
    assert off["total_cents"].tolist() == base["total_cents"].tolist()


# ---------------------------------------------------------------------------
# Q21 kernel unit pin: the one-pass EXISTS + NOT-EXISTS logic
# ---------------------------------------------------------------------------


def _q21_kernel(rows):
    block = pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.int64()),
            "side": pa.array([r[1] for r in rows], pa.int8()),
            "supp": pa.array([r[2] for r in rows], pa.int64()),
            "ret": pa.array([r[3] for r in rows], pa.bool_()),
        }
    )
    out = subq._q21_block(block)
    return sorted(zip(out.column("supp").to_pylist(), out.column("n").to_pylist()))


def test_q21_kernel_quantifiers():
    # order 1: suppliers 10 (returned) and 11 (not) → supplier 10 wins
    # order 2: suppliers 10 and 11 BOTH returned → nobody (NOT EXISTS fails)
    # order 3: only supplier 12, returned → nobody (EXISTS fails)
    # order 4: no build row (non-F order) → nobody
    rows = [
        (1, 0, None, None),
        (1, 1, 10, True), (1, 1, 11, False),
        (2, 0, None, None),
        (2, 1, 10, True), (2, 1, 11, True),
        (3, 0, None, None),
        (3, 1, 12, True),
        (4, 1, 13, True), (4, 1, 14, False),
    ]
    assert _q21_kernel(rows) == [(10, 1)]


def test_q21_kernel_merges_split_pair_partials():
    """The same (order, supplier) pair arriving as partials from two
    scan batches — one flagged, one not — must still count as ONE
    returned supplier (any-semantics), not two."""
    rows = [
        (1, 0, None, None),
        (1, 1, 10, False), (1, 1, 10, True),  # split partials, same pair
        (1, 1, 11, False),
    ]
    assert _q21_kernel(rows) == [(10, 1)]


# ---------------------------------------------------------------------------
# null-injected parity: join keys and measures
# ---------------------------------------------------------------------------

NULL_TARGETS = [
    "disjunctive_band_revenue",
    "nation_market_share",
    "small_qty_part_revenue",
    "sole_returned_supplier",
    "idle_rich_customers",
    "nation_pair_volume",
    "promo_revenue_share",
]


@pytest.fixture(scope="module")
def null_rel_sf(tmp_path_factory):
    """sf0.001 with 5% nulls in the join keys and measures the new
    shapes consume (lineitem keys/qty/price/flag, orders custkey/date,
    customer acctbal)."""
    tmp = str(tmp_path_factory.mktemp("nullrel"))
    for f in os.listdir(SF):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF, f), tmp)
    rng = np.random.default_rng(7)

    def inject(t, cols):
        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < 0.05)
            t = t.set_column(
                i, col, pa.compute.if_else(mask, pa.nulls(t.num_rows, arr.type), arr)
            )
        return t

    li = pq.read_table(os.path.join(SF, "lineitem.parquet"))
    pq.write_table(
        inject(li, ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_returnflag"]),
        os.path.join(tmp, "lineitem.parquet"),
    )
    orders = pq.read_table(os.path.join(SF, "orders.parquet"))
    pq.write_table(
        inject(orders, ["o_custkey", "o_orderdate"]), os.path.join(tmp, "orders.parquet")
    )
    cust = pq.read_table(os.path.join(SF, "customer.parquet"))
    pq.write_table(inject(cust, ["c_acctbal"]), os.path.join(tmp, "customer.parquet"))
    supp = pq.read_table(os.path.join(SF, "supplier.parquet"))
    # s_nationkey nulls pin the INNER-nation-join semantics: a supplier
    # with no nation row must not reach even the Q8 denominator
    pq.write_table(inject(supp, ["s_nationkey"]), os.path.join(tmp, "supplier.parquet"))
    return tmp


@pytest.fixture(scope="module")
def null_rel_con(null_rel_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.sql(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_rel_sf}/{v}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NULL_TARGETS)
def test_null_injected_parity(ray_session, null_rel_sf, null_rel_con, name):
    res = entry.queries()[name](null_rel_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_rel_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"
