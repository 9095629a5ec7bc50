"""Relational ops vs DuckDB oracles + join-miss semantics."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nifi_processors_ray.ops import relational as R

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for v in ["events", "customer", "lineitem", "orders"]:
        c.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{SF_DIR}/{v}.parquet')")
    return c


@pytest.mark.parametrize(
    "fn,sql",
    [
        (R.events_user_enrich, R.EVENTS_USER_ENRICH_SQL),
        (R.lineitem_pricing_summary, R.LINEITEM_PRICING_SQL),
        (R.events_asof_order, R.EVENTS_ASOF_ORDER_SQL),
    ],
    ids=["user_enrich", "pricing_summary", "asof_order"],
)
def test_relational_matches_sql(con, fn, sql):
    got = fn(SF_DIR).to_pandas()
    want = con.sql(sql).df()
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_asof_semantics_hand_example():
    import numpy as np

    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
            "o_orderdate": pa.array([100, 200, 200, 50], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_orderkey": pa.array([10, 11, 12, 20], pa.int64()),
        }
    )
    idx = R.build_asof_index(orders)
    batch = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "user_id": pa.array([1, 1, 2, 3], pa.int64()),
            # ts 150 → order 10; ts 250 → tie at date 200 broken by MAX key (12);
            # user 2 ts 10 → before first order → null; user 3 → no orders → null
            "ts": pa.array([150, 250, 10, 500], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = [r["last_orderkey"] for r in R._asof_batch(batch, idx).to_pylist()]
    assert out == [10, 12, None, None]


def test_lookup_left_join_nulls_on_miss():
    dim = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "name": pa.array(["one", "two"])}
    )
    batch = pa.table({"user_id": pa.array([2, 99, 1], pa.int64())})
    out = R._lookup_batch(batch, dim, key="user_id", cols=["name"]).to_pylist()
    assert [r["name"] for r in out] == ["two", None, "one"]


def test_running_total_block_hand_example():
    import numpy as np

    # two customers interleaved, dates out of order within the block
    block = pa.table(
        {
            "o_custkey": pa.array([2, 1, 2, 1], pa.int64()),
            "o_orderkey": pa.array([40, 10, 30, 20], pa.int64()),
            "o_orderdate": pa.array(
                np.array([300, 100, 200, 150], dtype="datetime64[us]")
            ),
            "price_cents": pa.array([5, 7, 11, 13], pa.int64()),
        }
    )
    out = R._running_total_block(block).to_pandas().set_index("o_orderkey")
    # cust 1: key 10 (t=100) -> 7, key 20 (t=150) -> 7+13
    assert out.loc[10, "running_cents"] == 7
    assert out.loc[20, "running_cents"] == 20
    # cust 2: key 30 (t=200) -> 11, key 40 (t=300) -> 11+5; cust 1's sum
    # never leaks into cust 2's frame
    assert out.loc[30, "running_cents"] == 11
    assert out.loc[40, "running_cents"] == 16


def test_pricing_rollup_levels_consistent(con):
    out = R.pricing_rollup(SF_DIR).to_pandas()
    base = out.dropna(subset=["l_returnflag", "l_linestatus"])
    subs = out[out["l_returnflag"].notna() & out["l_linestatus"].isna()]
    total = out[out["l_returnflag"].isna() & out["l_linestatus"].isna()]
    # each subtotal equals the sum of its base rows; grand total sums all
    for _, s in subs.iterrows():
        sel = base[base["l_returnflag"] == s["l_returnflag"]]
        assert s["n_rows"] == sel["n_rows"].sum()
        assert s["qty_cents"] == sel["qty_cents"].sum()
    assert len(total) == 1
    assert total.iloc[0]["n_rows"] == base["n_rows"].sum()
    want = con.sql(R.PRICING_ROLLUP_SQL).df()
    assert len(out) == len(want)


def test_orders_monthly_volume_matches_sql(con):
    got = R.orders_monthly_volume(SF_DIR).to_pandas()
    want = con.sql(R.ORDERS_MONTHLY_VOLUME_SQL).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)].reset_index(drop=True),
        check_dtype=False,
    )
    # month indexes are contiguous-ish calendar ints, not timestamps
    assert got["month_idx"].between(1960 * 12, 2100 * 12).all()


def test_pricing_unpivot_matches_sql(con):
    got = R.pricing_unpivot(SF_DIR).to_pandas()
    want = con.sql(R.PRICING_UNPIVOT_SQL).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)].reset_index(drop=True),
        check_dtype=False,
    )
    # long form: exactly one row per (group, metric)
    assert len(got) == got[["l_returnflag", "l_linestatus"]].drop_duplicates().shape[0] * 2


def test_ntile_formula_matches_duckdb():
    """_ntile_of must reproduce DuckDB NTILE(10) for every n, including
    n < k (each row its own tile) and uneven splits."""
    import duckdb
    import numpy as np

    from nifi_processors_ray.ops import relational as R

    con = duckdb.connect()
    for n in (1, 3, 9, 10, 11, 25, 97, 1000):
        want = [
            r[0]
            for r in con.sql(
                f"SELECT NTILE(10) OVER (ORDER BY i) FROM range({n}) t(i) ORDER BY i"
            ).fetchall()
        ]
        got = R._ntile_of(np.arange(n, dtype=np.int64), n).tolist()
        assert got == want, n


def test_dense_rank_null_prices_share_one_rank():
    """All NULL prices within a brand share ONE dense rank, ordered
    last (DuckDB DESC default NULLS LAST) — a raw NaN view would give
    every null its own rank."""
    import duckdb
    import pyarrow as pa
    from nifi_processors_ray.ops.relational import _dense_rank_block

    block = pa.table(
        {
            "p_brand": pa.array(["B1", "B1", "B1", "B1", "B2"]),
            "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "price_cents": pa.array([900, None, None, 700, None], pa.int64()),
        }
    )
    got = _dense_rank_block(block).to_pandas()
    con = duckdb.connect()
    con.register("t", block)
    want = con.sql(
        """
        SELECT p_brand, p_partkey, price_cents,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY p_brand ORDER BY price_cents DESC) AS BIGINT)
                 AS price_rank
        FROM t ORDER BY p_brand, price_rank, p_partkey
        """
    ).df()
    got = got.sort_values(["p_brand", "price_rank", "p_partkey"]).reset_index(drop=True)
    assert got.equals(want.reset_index(drop=True)), f"\ngot:\n{got}\nwant:\n{want}"


def test_balance_pctile_null_and_tie_semantics_match_duckdb(ray_session):
    """Null balances: ONE peer group ordered last (DuckDB ASC NULLS LAST);
    ties share the min rank; a 1-row partition gets pct_rank 0."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from nifi_processors_ray.ops.relational import _pctile_block

    t = pa.table(
        {
            "c_custkey": pa.array(list(range(1, 9)), pa.int64()),
            "c_nationkey": pa.array([0, 0, 0, 0, 0, 1, 2, 2], pa.int64()),
            "bal_cents": pa.array([500, 500, None, 100, None, 7, 3, 3], pa.int64()),
        }
    )
    eng = _pctile_block(t).to_pandas()
    con = duckdb.connect()
    con.register("c", t.to_pandas())
    ora = con.sql(
        """
        SELECT c_custkey, c_nationkey, bal_cents,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM c WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_cents)
        ORDER BY c_nationkey, c_custkey
        """
    ).df()
    eng = eng.sort_values(["c_nationkey", "c_custkey"]).reset_index(drop=True)
    ora = ora.sort_values(["c_nationkey", "c_custkey"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
