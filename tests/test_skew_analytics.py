"""Hot-key skew stress for the blockwise analytics operators.

At 100 TB a 'hot' key (one conversation, one power user) is the norm,
not the exception.  The blockwise group operators rely on Ray sort
co-location, which necessarily pulls a hot key's ENTIRE run into one
output block — these tests pin that (a) the kernels stay correct when
one key owns half the table and the surrounding blocks are tiny, and
(b) results still match the DuckDB twins row for row.

(The CDC merge path handles hot conversations by SALTING the hash
partitioner — `stages/partition.py` — because LWW merge only needs
per-(key, salt) locality.  The analytics window ops cannot salt without
breaking frame semantics, so their contract is 'hot run fits one
block'; this suite is the executable statement of that contract.)
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

N = 20_000
HOT_FRACTION = 0.5


@pytest.fixture(scope="module")
def skew_sf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("skewsf")
    rng = np.random.default_rng(13)
    n_hot = int(N * HOT_FRACTION)
    user = np.concatenate([np.zeros(n_hot, np.int64), rng.integers(1, 500, N - n_hot)])
    rng.shuffle(user)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(N, dtype=np.int64)),
            "ts": pa.array(
                np.sort(rng.integers(0, 86_400_000_000, N)).astype("datetime64[us]")
            ),
            "user_id": pa.array(user),
            "event_type": pa.array(
                rng.choice(["signup", "view", "click", "purchase", "error"], N)
            ),
            "value": pa.array(rng.uniform(0.01, 500, N).round(2)),
            "props": pa.array(["{}"] * N),
        }
    )
    # many small row groups → many input blocks → the hot run must be
    # re-co-located by the exchange, not inherited from the layout
    pq.write_table(t, str(tmp / "events.parquet"), row_group_size=512)
    return str(tmp)


@pytest.fixture(scope="module")
def skew_con(skew_sf):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{skew_sf}/events.parquet')")
    return con


SKEW_TARGETS = [
    "events_sessionize", "events_moving_sum", "events_user_gaps",
    "events_type_transitions", "latest_event_per_user", "events_topk_users",
    "events_window_agg", "events_funnel", "events_value_quantiles",
    # round-3 continuation blockwise group kernels
    "events_modal_type", "events_first_last",
    # third-continuation kernels: window explode, cohort fold, islands
    "events_rolling_users", "events_cohort_retention", "events_user_streaks",
]


@pytest.mark.parametrize("name", SKEW_TARGETS)
def test_hot_key_parity(ray_session, skew_sf, skew_con, name):
    import ray.data

    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024  # force many small blocks
    try:
        res = entry.queries()[name](skew_sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    finally:
        ctx.target_max_block_size = prev
    ot = skew_con.sql(entry.oracle_sql()[name]).df()
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}: hot-key divergence\n{df.head()}\nvs\n{ot.head()}"


@pytest.fixture(scope="module")
def skew_docs_sf(tmp_path_factory):
    """Documents where ONE text is 40% of the corpus (a viral duplicate —
    the classic dedup hot key) plus unique tails."""
    tmp = tmp_path_factory.mktemp("skewdocs")
    rng = np.random.default_rng(29)
    n = 5_000
    n_hot = n * 2 // 5
    texts = ["the same viral boilerplate page text repeated everywhere"] * n_hot + [
        f"unique document body {i} " + " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta"], 8)
        )
        for i in range(n - n_hot)
    ]
    order = rng.permutation(n)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([texts[i] for i in order]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["web"] * n),
            "n_chars": pa.array([len(texts[i]) for i in order], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp / "documents.parquet"), row_group_size=256)
    return str(tmp)


def test_hot_duplicate_exact_dedup(ray_session, skew_docs_sf):
    import ray.data

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{skew_docs_sf}/documents.parquet')"
    )
    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        df = entry.queries()["exact_dedup"](skew_docs_sf).to_pandas()
    finally:
        ctx.target_max_block_size = prev
    ot = con.sql(entry.oracle_sql()["exact_dedup"]).df()
    df = df.sort_index(axis=1).sort_values(list(df.sort_index(axis=1).columns)).reset_index(drop=True)
    ot = ot.sort_index(axis=1).sort_values(list(ot.sort_index(axis=1).columns)).reset_index(drop=True)
    assert df.equals(ot)


@pytest.fixture(scope="module")
def hot_null_sf(tmp_path_factory):
    """Events where the HOT key is NULL itself — 40% anonymous traffic.
    The sentinel-filled shadow key makes the null run sortable; the
    run-integrity repair must then treat the None run like any other
    spanning key (the boundary compare sees None == None)."""
    tmp = tmp_path_factory.mktemp("hotnull")
    rng = np.random.default_rng(31)
    n = 20_000
    n_null = int(n * 0.4)
    user = [None] * n_null + [int(u) for u in rng.integers(1, 400, n - n_null)]
    rng.shuffle(user)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.sort(rng.integers(0, 86_400_000_000, n)).astype("datetime64[us]")
            ),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(
                rng.choice(["signup", "view", "click", "purchase"], n)
            ),
            "value": pa.array(rng.uniform(0.01, 500, n).round(2)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, str(tmp / "events.parquet"), row_group_size=512)
    return str(tmp)


@pytest.mark.parametrize(
    "name",
    [
        "events_sessionize", "events_user_gaps", "events_moving_sum",
        "latest_event_per_user", "events_modal_type",
    ],
)
def test_hot_null_key_parity(ray_session, hot_null_sf, name):
    import ray.data

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{hot_null_sf}/events.parquet')")
    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        df = entry.queries()[name](hot_null_sf).to_pandas()
    finally:
        ctx.target_max_block_size = prev
    ot = con.sql(entry.oracle_sql()[name]).df()
    df = df.sort_index(axis=1).sort_values(list(df.sort_index(axis=1).columns)).reset_index(drop=True)
    ot = ot.sort_index(axis=1).sort_values(list(ot.sort_index(axis=1).columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}: hot-NULL-key divergence"


# ---------------------------------------------------------------------------
# relational / join-chain skew: a hot customer and a monster order
# ---------------------------------------------------------------------------

REL_N_ORDERS = 8_000
HOT_CUSTKEY = 1  # exists in the sf0.001 customer table
HOT_ORDERKEY = 0  # gets 4_000 lineitems


@pytest.fixture(scope="module")
def skew_rel_sf(tmp_path_factory):
    """TPC-H-ish tables where one customer owns half the orders and one
    order owns a 4k-lineitem run — the join-chain kernels' hot keys."""
    import os
    import shutil

    tmp = str(tmp_path_factory.mktemp("skewrel"))
    src = "/root/testdata/sf0.001"
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), tmp)

    rng = np.random.default_rng(29)
    n_hot = REL_N_ORDERS // 2
    cust = np.concatenate(
        [np.full(n_hot, HOT_CUSTKEY, np.int64), rng.integers(0, 150, REL_N_ORDERS - n_hot)]
    )
    rng.shuffle(cust)
    dates = rng.integers(  # 1995-01-01 .. 1999-01-01, us epoch
        789_004_800_000_000, 915_148_800_000_000, REL_N_ORDERS
    ).astype("datetime64[us]")
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(REL_N_ORDERS, dtype=np.int64)),
            "o_custkey": pa.array(cust),
            "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], REL_N_ORDERS)),
            "o_totalprice": pa.array(rng.uniform(100, 50_000, REL_N_ORDERS).round(2)),
            "o_orderdate": pa.array(dates),
            "o_orderpriority": pa.array(
                rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], REL_N_ORDERS)
            ),
        }
    )
    pq.write_table(orders, f"{tmp}/orders.parquet", row_group_size=256)

    per_order = rng.integers(1, 5, REL_N_ORDERS)
    okeys = np.concatenate(
        [np.repeat(np.arange(REL_N_ORDERS, dtype=np.int64), per_order),
         np.full(4_000, HOT_ORDERKEY, np.int64)]
    )
    rng.shuffle(okeys)
    m = len(okeys)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(okeys),
            "l_partkey": pa.array(rng.integers(0, 200, m)),
            "l_suppkey": pa.array(rng.integers(0, 10, m)),  # sf0.001 has 10 suppliers
            "l_linenumber": pa.array(rng.integers(1, 8, m).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, m).astype(np.float64)),
            "l_extendedprice": pa.array(rng.uniform(10, 90_000, m).round(2)),
            "l_discount": pa.array(rng.choice([0.0, 0.02, 0.05, 0.1], m)),
            "l_tax": pa.array(rng.choice([0.0, 0.04, 0.08], m)),
            "l_returnflag": pa.array(rng.choice(["R", "N", "A"], m)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], m)),
            "l_shipdate": pa.array(
                rng.integers(789_004_800_000_000, 946_684_800_000_000, m).astype(
                    "datetime64[us]"
                )
            ),
        }
    )
    pq.write_table(lineitem, f"{tmp}/lineitem.parquet", row_group_size=256)
    return tmp


@pytest.fixture(scope="module")
def skew_rel_con(skew_rel_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.sql(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{skew_rel_sf}/{v}.parquet')"
        )
    return con


REL_SKEW_TARGETS = [
    "local_supplier_volume", "returned_item_revenue", "shipping_priority",
    "customer_order_counts", "top_orders_per_cust", "order_priority_revenue",
    "order_size_distribution", "customers_without_orders",
    "ship_delay_profile", "large_volume_customers", "revenue_forecast",
    "customer_rfm",
    # correlated-subquery / quantifier shapes: the monster order stresses
    # the one-pass EXISTS+NOT-EXISTS kernel, the hot customer the Q22
    # anti-join and Q7 tagging hops
    "small_qty_part_revenue", "sole_returned_supplier",
    "idle_rich_customers", "nation_pair_volume", "promo_revenue_share",
    "disjunctive_band_revenue", "nation_market_share",
]


@pytest.fixture()
def many_scan_blocks(monkeypatch):
    """Disable footer-sized scan blocks (reader.suggest_scan_blocks) so
    these fixtures keep their many-tiny-blocks shape — the hot runs must
    SPAN blocks for the repair machinery to be exercised in situ."""
    monkeypatch.setenv("NPR_READ_ROWS_PER_BLOCK", "0")


@pytest.mark.parametrize("name", REL_SKEW_TARGETS)
def test_join_chain_hot_keys_match_oracle(
    ray_session, skew_rel_sf, skew_rel_con, many_scan_blocks, name
):
    res = entry.queries()[name](skew_rel_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = skew_rel_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        # values agree (zero rows each); Ray's to_pandas drops columns
        # on an all-empty dataset, so a frame compare can't be used here
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"
