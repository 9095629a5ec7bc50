"""Extreme int64-magnitude probe (round 5): money/moment kernels must
never WRAP silently where DuckDB raises — outcome parity (same values,
or both raise) at value magnitudes that overflow cents², Σcents and
finally FLOOR(value*100) itself.

Found+fixed by this probe: events_value_moments batch partials (Arrow
int64 group-sum wrap) and events_user_outliers per-user moment sums
(numpy int64 multiply/reduceat wrap) returned wrapped values where the
twin raised OutOfRangeException.  Guards: pc.multiply_checked +
float64-shadow folds (functions/checked.py, debug.py fast-path Sum).
"""

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

EVENT_QUERIES = [
    "events_value_moments", "events_user_trend", "events_user_outliers",
    "events_moving_sum", "events_value_histogram", "events_median_cont",
    "events_value_quantiles",
]
MONEY_QUERIES = ["lineitem_pricing_summary", "revenue_forecast", "orders_running_total"]


def _scaled_sf(tmp_path, mult, table, col):
    d = str(tmp_path / f"sf_{table}_{mult:g}")
    os.makedirs(d)
    for f in os.listdir(SF):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF, f), os.path.join(d, f))
    t = pq.read_table(os.path.join(d, f"{table}.parquet"))
    t = t.set_column(
        t.schema.get_field_index(col), col, pc.multiply(t.column(col), float(mult))
    )
    pq.write_table(t, os.path.join(d, f"{table}.parquet"))
    return d


def _outcome_parity(d, names):
    con = duckdb.connect()
    for tn in TABLES:
        con.sql(f"CREATE VIEW {tn} AS SELECT * FROM read_parquet('{d}/{tn}.parquet')")
    O, Q = E.oracle_sql(), E.queries()
    for name in names:
        try:
            want = con.sql(O[name]).df()
            oerr = None
        except Exception as ex:
            want, oerr = None, ex
        try:
            r = Q[name](d)
            got = r.to_pandas() if hasattr(r, "to_pandas") else r
            eerr = None
        except Exception as ex:
            got, eerr = None, ex
        assert (oerr is None) == (eerr is None), (
            f"{name}: outcome diverged — oracle "
            f"{type(oerr).__name__ if oerr else 'OK'} vs engine "
            f"{type(eerr).__name__ if eerr else 'OK'} (a silent int64 wrap?)"
        )
        if oerr is None:
            cols = sorted(want.columns)
            assert got[cols].sort_values(cols).reset_index(drop=True).equals(
                want[cols].sort_values(cols).reset_index(drop=True)
            ), f"{name}: values diverged at extreme magnitude"


@pytest.mark.parametrize("mult", [1e6, 1e12, 1e16])
def test_event_value_magnitudes(tmp_path, mult):
    """cents² overflows at 1e6, Σcents at 1e12, FLOOR(v*100) at 1e16 —
    every rung must be outcome-parity (both raise or both match)."""
    d = _scaled_sf(tmp_path, mult, "events", "value")
    _outcome_parity(d, EVENT_QUERIES)


def test_money_column_magnitudes(tmp_path):
    d = _scaled_sf(tmp_path, 1e12, "lineitem", "l_extendedprice")
    _outcome_parity(d, ["lineitem_pricing_summary", "revenue_forecast"])
    d2 = _scaled_sf(tmp_path, 1e12, "orders", "o_totalprice")
    _outcome_parity(d2, ["orders_running_total"])


def test_group_sums_checked_beyond_2e53_matches_duckdb():
    """Round-5 review: values above 2^53 whose group sum fits BIGINT
    must AGGREGATE (DuckDB succeeds) — Arrow's checked int64→float64
    cast raised ArrowInvalid before any aggregation.  A genuine wrap at
    the same magnitudes must still raise OverflowError."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from nifi_processors_ray.functions.checked import group_sums_checked

    big = 2**54
    vals = np.empty(512, dtype=np.int64)
    vals[0::2] = big
    vals[1::2] = -big  # cancels: sum = 0, fits BIGINT trivially
    t = pa.table({"k": pa.array(["g"] * 512), "x": pa.array(vals)})
    g = group_sums_checked(t, ["k"], ["x"])
    assert g.column("x_sum").to_pylist() == [0]
    want = duckdb.sql(
        "SELECT CAST(SUM(x) AS BIGINT) FROM (SELECT unnest([{}]) x)".format(
            ",".join(map(str, vals[:8].tolist()))
        )
    ).fetchone()[0]
    assert want == 0  # DuckDB agrees the shape is legal

    # a genuine wrap (all-positive 2^62 × 8 rows) must still fail loud
    t2 = pa.table(
        {"k": pa.array(["g"] * 8), "x": pa.array(np.full(8, 2**62, dtype=np.int64))}
    )
    import pytest

    with pytest.raises(OverflowError):
        group_sums_checked(t2, ["k"], ["x"])


def test_q6_partial_beyond_2e53_aggregates_not_crashes():
    """The divergence window the parity sweep missed: per-row cents in
    (2^53, 2^63) whose batch sum fits BIGINT.  DuckDB's HUGEINT
    accumulator succeeds there, so the engine's float64 shadow must use
    a LOSSY cast (Arrow's checked int64→float64 refuses anything above
    2^53) — and a genuinely wrapping batch must still raise."""
    from nifi_processors_ray.ops.relational import _q6_partial

    big = int(2**54)  # representable-exactly, above the checked-cast cap
    ok = pa.table(
        {
            "l_extendedprice": pa.array([big / 100, big / 100], pa.float64()),
            "l_discount": pa.array([1.0, 1.0], pa.float64()),
        }
    )
    out = _q6_partial(ok)
    assert out.column("promo_cents")[0].as_py() == 2 * big

    n = 4
    huge = float(2**62)  # per-row cents ~2^62: n rows wrap int64
    wrap = pa.table(
        {
            "l_extendedprice": pa.array([huge / 100] * n, pa.float64()),
            "l_discount": pa.array([1.0] * n, pa.float64()),
        }
    )
    with pytest.raises(OverflowError):
        _q6_partial(wrap)
