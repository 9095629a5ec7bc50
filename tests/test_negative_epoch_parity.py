"""Negative-epoch parity: the events time-bucketing family vs its
DuckDB twins with EVERY timestamp shifted before 1970.

Window/hour/day bucketing on negative epoch values is where integer
division semantics diverge (DuckDB ``//`` truncates toward zero, numpy
``//`` floors; dayofweek is floor-based calendar) — the engine's
``_truncdiv`` / floor-division calibrations have unit tests, and this
suite pins them at the QUERY level where a drifted kernel would
silently shift whole window groups.
"""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

SRC = "/root/testdata/sf0.001"

# the time-semantics-bearing subset (sampling/enrich/share ops don't
# read the clock; the full family was probed green once — this keeps
# the permanent suite lean)
NEG_EPOCH_TARGETS = [
    "events_window_agg", "events_sessionize", "events_hopping_agg",
    "events_hourly_dense", "events_hourly_retention", "events_moving_sum",
    "events_rolling_users", "events_cohort_retention", "events_user_streaks",
    "events_user_gaps", "events_first_last", "events_conversions_within",
    "events_local_density", "events_user_trend", "latest_event_per_user",
    "events_funnel",
]


@pytest.fixture(scope="module")
def neg_epoch_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("negepoch"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
    # shift everything ~60 years back: every epoch microsecond negative,
    # sub-day structure (hours, gaps, sessions) preserved
    ts = ts - np.int64(60 * 365 * 86_400_000_000)
    assert (ts[~np.isnan(ts.astype(np.float64))] < 0).all()
    i = t.schema.get_field_index("ts")
    t = t.set_column(i, "ts", pa.array(ts, pa.int64()).cast(pa.timestamp("us")))
    pq.write_table(t, os.path.join(tmp, "events.parquet"))
    return tmp


@pytest.fixture(scope="module")
def neg_epoch_con(neg_epoch_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{neg_epoch_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", NEG_EPOCH_TARGETS)
def test_events_negative_epoch_parity(ray_session, neg_epoch_sf, neg_epoch_con, name):
    res = entry.queries()[name](neg_epoch_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = neg_epoch_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1).sort_values(list(sorted(df.columns))).reset_index(drop=True)
    ot = ot.sort_index(axis=1).sort_values(list(sorted(ot.columns))).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"
