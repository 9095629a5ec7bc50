"""Adversarial edges for ops/warehouse.py the shared suites don't hit.

The join/part null-injection suites (test_null_robustness.py) corrupt
customer/orders/part/supplier; these tests cover the remaining inputs:
a NULL name in the nation dim (a matched group must KEEP its NULL name
— review finding: an is_valid(n_name) filter silently dropped it) and
lineitem-column nulls across every probed column.
"""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

SRC = "/root/testdata/sf0.001"

WAREHOUSE_QUERIES = [
    "cheapest_part_supplier",
    "priority_with_large_items",
    "nation_profit",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "brand_supplier_counts",
]


def _compare(name, sf_dir, con):
    res = entry.queries()[name](sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1).sort_values(list(sorted(df.columns))).reset_index(drop=True)
    ot = ot.sort_index(axis=1).sort_values(list(sorted(ot.columns))).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


@pytest.fixture(scope="module")
def null_nation_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nullnation"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    t = pq.read_table(os.path.join(SRC, "nation.parquet"))
    i = t.schema.get_field_index("n_name")
    # null out two nation names: matched groups must keep a NULL name
    mask = pa.array(np.arange(t.num_rows) % 11 == 0)
    t = t.set_column(
        i, "n_name", pc.if_else(mask, pa.nulls(t.num_rows, pa.string()), t.column("n_name"))
    )
    pq.write_table(t, os.path.join(tmp, "nation.parquet"))
    return tmp


@pytest.fixture(scope="module")
def null_nation_con(null_nation_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_nation_sf}/{v}.parquet')")
    yield con
    con.close()


def test_nation_profit_keeps_null_nation_names(ray_session, null_nation_sf, null_nation_con):
    _compare("nation_profit", null_nation_sf, null_nation_con)


@pytest.fixture(scope="module")
def null_lineitem_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nulllineitem"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(17)
    t = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    for col in ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"]:
        i = t.schema.get_field_index(col)
        arr = t.column(col).combine_chunks()
        mask = pa.array(rng.random(t.num_rows) < 0.07)
        t = t.set_column(i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr))
    pq.write_table(t, os.path.join(tmp, "lineitem.parquet"))
    return tmp


@pytest.fixture(scope="module")
def null_lineitem_con(null_lineitem_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_lineitem_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", WAREHOUSE_QUERIES)
def test_warehouse_lineitem_null_injected_parity(
    ray_session, null_lineitem_sf, null_lineitem_con, name
):
    _compare(name, null_lineitem_sf, null_lineitem_con)
