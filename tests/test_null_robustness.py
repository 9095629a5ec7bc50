"""Null-injected oracle parity for the event-analytics family.

Foreign data carries NULLs the synthetic testdata never does.  This
suite injects 5% nulls into events.{user_id,event_type,value} and runs
every event-consuming oracled query against its DuckDB twin on the SAME
corrupted table — pinning the engine-wide null contract:

- exchanges (sort AND sort-based groupby) ride shadow sentinel keys
  (``functions.debug.null_safe_sort`` / ``null_safe_groupby_agg``) —
  Ray's boundary sampler TypeErrors nondeterministically on raw None;
- block kernels group null keys as ONE run (dictionary codes, never a
  NaN-float view where NaN != NaN splits every row);
- set-op/join key domains exclude nulls EXPLICITLY on both sides;
- window frames over null measures match SQL (skip-null sums, null
  when the whole frame is null).
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

TARGETS = [
    "events_window_agg", "events_sessionize", "events_topk_users",
    "events_distinct_types", "events_sample", "events_stratified_sample",
    "events_value_quantiles", "events_median_cont", "events_mad",
    "events_trimmed_mean",
    "events_moving_sum",
    "events_hourly_retention", "events_value_histogram",
    "events_type_transitions", "events_hourly_dense", "events_profile",
    "events_user_gaps", "events_type_pivot", "events_hopping_agg",
    "events_funnel", "latest_event_per_user", "events_modal_type",
    "events_value_moments", "events_type_share", "events_first_last",
    "active_customer_ids",
    "inactive_customer_ids", "all_actor_ids", "customer_activity_full",
    "events_user_enrich", "events_asof_order", "customer_spend_deciles",
    "events_user_outliers", "events_props_extract",
    "events_local_density", "events_user_trend", "events_rolling_users",
    "events_cohort_retention", "events_user_streaks",
    "events_weighted_sample", "events_conversions_within",
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nullsf"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    rng = np.random.default_rng(42)
    n = t.num_rows

    def inject(col, typ):
        mask = rng.random(n) < 0.05
        vals = [None if m else v for v, m in zip(t.column(col).to_pylist(), mask)]
        return pa.array(vals, typ)

    for col, typ in [("user_id", pa.int64()), ("event_type", pa.string()), ("value", pa.float64())]:
        t = t.set_column(t.schema.get_field_index(col), col, inject(col, typ))
    pq.write_table(t, os.path.join(tmp, "events.parquet"))
    return tmp


@pytest.fixture(scope="module")
def null_con(null_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_sf}/{v}.parquet')")
    return con


@pytest.mark.parametrize("name", TARGETS)
def test_null_injected_parity(ray_session, null_sf, null_con, name):
    res = entry.queries()[name](null_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_con.sql(entry.oracle_sql()[name]).df()
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


DOC_TARGETS = [
    "text_stats", "lang_id", "token_counts", "exact_dedup", "corpus_clean",
    "token_pack", "decontaminate", "text_redact", "top_ngrams",
    "training_mix", "jaccard_dup_pairs", "dedup_clusters", "doc_repetition",
    "corpus_source_rollup", "doc_top_terms",
]


@pytest.fixture(scope="module")
def null_docs_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nulldocs"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    rng = np.random.default_rng(7)
    n = t.num_rows

    def inject(col):
        mask = rng.random(n) < 0.05
        vals = [None if m else v for v, m in zip(t.column(col).to_pylist(), mask)]
        return pa.array(vals, pa.string())

    for col in ["text", "lang"]:
        t = t.set_column(t.schema.get_field_index(col), col, inject(col))
    pq.write_table(t, os.path.join(tmp, "documents.parquet"))
    return tmp


@pytest.fixture(scope="module")
def null_docs_con(null_docs_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_docs_sf}/{v}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", DOC_TARGETS)
def test_null_text_parity(ray_session, null_docs_sf, null_docs_con, name):
    res = entry.queries()[name](null_docs_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_docs_con.sql(entry.oracle_sql()[name]).df()
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


def test_null_safe_fill_widens_narrow_and_unsigned_ints():
    from nifi_processors_ray.functions import debug as D

    # int32 with a null: must widen to int64 and fill (fill of int64-min
    # into raw int32 would raise ArrowInvalid)
    col = pa.chunked_array([pa.array([1, None, 3], pa.int32())])
    out = D._null_safe_fill(col, strict=True)
    assert out.type == pa.int64()
    assert out.to_pylist() == [1, D.NULL_INT_SENTINEL, 3]
    assert D._restore(out).to_pylist() == [1, None, 3]
    # uint64 keeps its own sentinel (cast to int64 could overflow)
    col = pa.chunked_array([pa.array([1, None, 2**63 + 5], pa.uint64())])
    out = D._null_safe_fill(col, strict=True)
    assert out.type == pa.uint64()
    assert D._restore(out).to_pylist() == [1, None, 2**63 + 5]


def test_null_safe_fill_rejects_sentinel_collision():
    from nifi_processors_ray.functions import debug as D

    col = pa.chunked_array([pa.array(["a", D.NULL_STR_SENTINEL], pa.string())])
    with pytest.raises(ValueError, match="collides"):
        D._null_safe_fill(col)


def test_null_safe_groupby_rejects_unmapped_key_type(ray_session):
    import ray.data
    from ray.data.aggregate import Count

    from nifi_processors_ray.functions import debug as D

    ds = ray.data.from_arrow(pa.table({"k": pa.array([True, False, None])}))
    with pytest.raises(Exception, match="unsupported key type"):
        D.null_safe_groupby_agg(ds, "k", Count(alias_name="n")).take_all()


# ---------------------------------------------------------------------------
# joins-family null injection: customer/order keys, names, priorities
# (caught live: a null o_orderpriority crashed the join kernel's
# bincount; a null o_custkey shredded the top-N partition into
# per-row groups)
# ---------------------------------------------------------------------------

JOIN_NULL_TARGETS = [
    "customers_without_orders", "customers_with_urgent_orders",
    "top_orders_per_cust", "brand_revenue", "order_priority_revenue",
    "quantity_band_counts", "shipping_priority",
    "customer_order_distribution", "priority_with_large_items",
]


@pytest.fixture(scope="module")
def null_join_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nulljoin"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(11)

    def inject(t, cols):
        import pyarrow.compute as pc

        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < 0.05)
            t = t.set_column(
                i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr)
            )
        return t

    cust = pq.read_table(os.path.join(SRC, "customer.parquet"))
    pq.write_table(
        inject(cust, ["c_custkey", "c_name", "c_mktsegment"]),
        os.path.join(tmp, "customer.parquet"),
    )
    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    pq.write_table(
        inject(orders, ["o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"]),
        os.path.join(tmp, "orders.parquet"),
    )
    return tmp


@pytest.fixture(scope="module")
def null_join_con(null_join_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_join_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", JOIN_NULL_TARGETS)
def test_join_family_null_injected_parity(ray_session, null_join_sf, null_join_con, name):
    res = entry.queries()[name](null_join_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_join_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


# ---------------------------------------------------------------------------
# part/supplier-dimension null injection (keys, labels, measures)
# ---------------------------------------------------------------------------

PART_NULL_TARGETS = [
    "part_price_rank", "brand_revenue", "small_qty_part_revenue",
    "promo_revenue_share", "disjunctive_band_revenue",
    "nation_market_share", "supplier_nation_rollup",
    "sole_returned_supplier", "ship_delay_profile",
    "cheapest_part_supplier", "brand_supplier_counts",
    "nation_profit", "top_revenue_suppliers",
]


@pytest.fixture(scope="module")
def null_part_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nullpart"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(5)

    def inject(t, cols):
        import pyarrow.compute as pc

        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < 0.08)
            t = t.set_column(
                i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr)
            )
        return t

    part = pq.read_table(os.path.join(SRC, "part.parquet"))
    pq.write_table(
        inject(part, ["p_partkey", "p_brand", "p_type", "p_size", "p_retailprice", "p_name"]),
        os.path.join(tmp, "part.parquet"),
    )
    supp = pq.read_table(os.path.join(SRC, "supplier.parquet"))
    pq.write_table(
        inject(supp, ["s_suppkey", "s_name", "s_acctbal"]),
        os.path.join(tmp, "supplier.parquet"),
    )
    return tmp


@pytest.fixture(scope="module")
def null_part_con(null_part_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_part_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", PART_NULL_TARGETS)
def test_part_dim_null_injected_parity(ray_session, null_part_sf, null_part_con, name):
    res = entry.queries()[name](null_part_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_part_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


# ---------------------------------------------------------------------------
# documents-table null injection over the text/dedup family (caught
# live: a null table n_chars went through an undefined NaN->int64 cast
# in text_stats instead of staying NULL like the twin)
# ---------------------------------------------------------------------------

DOCS_NULL_TARGETS = [
    "doc_chunks", "corpus_shuffle_shards", "doc_top_terms", "top_ngrams",
    "doc_repetition", "corpus_source_rollup", "text_stats", "lang_id",
    "token_counts", "text_redact", "dedup_incremental", "exact_dedup",
    "decontaminate",
]


@pytest.fixture(scope="module")
def null_docs_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nulldocs"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(9)

    def inject(t, cols, rate=0.06):
        import pyarrow.compute as pc

        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < rate)
            t = t.set_column(
                i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr)
            )
        return t

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    pq.write_table(
        inject(docs, ["text", "lang", "source", "n_chars"]),
        os.path.join(tmp, "documents.parquet"),
    )
    return tmp


@pytest.fixture(scope="module")
def null_docs_con(null_docs_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_docs_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", DOCS_NULL_TARGETS)
def test_docs_family_null_injected_parity(ray_session, null_docs_sf, null_docs_con, name):
    res = entry.queries()[name](null_docs_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_docs_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


# ---------------------------------------------------------------------------
# event_id / ts / props null injection (columns the original events
# suite never corrupted; caught live: NaN hashes inflated the samples,
# NaN hours junk-split window groups and crashed the dense spine, and
# the asof/density twins' per-event GROUP BY collapsed null ids)
# ---------------------------------------------------------------------------

EVENT_KEY_NULL_TARGETS = [
    "events_sample", "events_stratified_sample", "events_weighted_sample",
    "events_window_agg", "events_sessionize", "events_moving_sum",
    "events_first_last", "events_hourly_dense", "events_hopping_agg",
    "events_props_extract", "events_funnel", "latest_event_per_user",
    "events_rolling_users", "events_cohort_retention", "events_user_streaks",
    "events_conversions_within", "events_local_density", "events_user_trend",
    "events_asof_order", "events_user_enrich", "events_topk_users",
]


@pytest.fixture(scope="module")
def null_evkey_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nullevkey"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(21)

    def inject(t, cols, rate=0.05):
        import pyarrow.compute as pc

        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < rate)
            t = t.set_column(
                i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr)
            )
        return t

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    pq.write_table(
        inject(ev, ["event_id", "ts", "props"]), os.path.join(tmp, "events.parquet")
    )
    return tmp


@pytest.fixture(scope="module")
def null_evkey_con(null_evkey_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_evkey_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_KEY_NULL_TARGETS)
def test_event_key_null_injected_parity(ray_session, null_evkey_sf, null_evkey_con, name):
    res = entry.queries()[name](null_evkey_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_evkey_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


# ---------------------------------------------------------------------------
# embeddings-table null injection (caught live: a null embedding list
# crashed every matmul reshape; a null label TypeError'd the raw
# sort-based groupby and np.unique shredded it into per-row groups)
# ---------------------------------------------------------------------------

EMB_NULL_TARGETS = ["knn_brute", "knn_range", "label_vector_sums", "label_centroids"]


@pytest.fixture(scope="module")
def null_emb_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nullemb"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(33)

    def inject(t, cols, rate=0.05):
        import pyarrow.compute as pc

        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < rate)
            t = t.set_column(
                i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr)
            )
        return t

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    pq.write_table(
        inject(emb, ["vec_id", "label", "embedding"]),
        os.path.join(tmp, "embeddings.parquet"),
    )
    return tmp


@pytest.fixture(scope="module")
def null_emb_con(null_emb_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_emb_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_NULL_TARGETS)
def test_embeddings_null_injected_parity(ray_session, null_emb_sf, null_emb_con, name):
    res = entry.queries()[name](null_emb_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_emb_con.sql(entry.oracle_sql()[name]).df()
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert len(df) == len(ot), name
    for c in df.columns:
        if df[c].dtype.kind == "f":
            np.testing.assert_array_equal(df[c].to_numpy(), ot[c].to_numpy(), err_msg=f"{name}.{c}")
        else:
            assert (df[c].fillna(-9) == ot[c].fillna(-9)).all(), f"{name}.{c}"


# ---------------------------------------------------------------------------
# nation/region (tiny driver-read dims) null injection — keys AND labels
# ---------------------------------------------------------------------------

NATION_NULL_TARGETS = [
    "supplier_nation_rollup", "events_user_enrich", "nation_profit",
    "local_supplier_volume", "nation_market_share", "nation_pair_volume",
    "returned_item_revenue",
]


@pytest.fixture(scope="module")
def null_nation_dim_sf(tmp_path_factory):
    """Nulls in the composed-on-the-driver dims: a null n_nationkey /
    n_regionkey can never join (and pc.index_in would otherwise MATCH a
    null fact key to it — verified Arrow behavior the lookup kernel now
    guards); a null n_name / r_name is a MATCHED group SQL keeps with a
    NULL label (the nation_profit / rollup review-finding class)."""
    tmp = str(tmp_path_factory.mktemp("nullnatdim"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(47)

    def inject(name, cols, frac):
        import pyarrow.compute as pc

        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < frac)
            t = t.set_column(i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr))
        pq.write_table(t, os.path.join(tmp, f"{name}.parquet"))

    inject("nation", ["n_nationkey", "n_regionkey", "n_name"], 0.12)
    inject("region", ["r_name", "r_regionkey"], 0.25)
    # fact-side nation FKs: a null c_nationkey must drop the customer
    # ROW through an INNER nation join (Q10), not survive null-labeled
    inject("customer", ["c_nationkey"], 0.08)
    inject("supplier", ["s_nationkey"], 0.08)
    return tmp


@pytest.fixture(scope="module")
def null_nation_dim_con(null_nation_dim_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_nation_dim_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", NATION_NULL_TARGETS)
def test_nation_dim_null_injected_parity(
    ray_session, null_nation_dim_sf, null_nation_dim_con, name
):
    res = entry.queries()[name](null_nation_dim_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_nation_dim_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


# ---------------------------------------------------------------------------
# doc_id / date-column null injection (the last uninjected key columns)
# ---------------------------------------------------------------------------

DOCID_DATE_NULL_TARGETS = [
    "exact_dedup", "corpus_source_rollup", "doc_top_terms", "corpus_clean",
    "training_mix", "token_pack", "corpus_shuffle_shards", "doc_chunks",
    "jaccard_dup_pairs", "dedup_clusters", "dedup_incremental",
    "orders_monthly_volume", "orders_yoy_growth", "orders_dow_profile",
    "orders_running_total", "lineitem_pricing_summary", "revenue_forecast",
    "shipping_priority", "priority_with_large_items", "top_revenue_suppliers",
    "nation_profit", "promo_revenue_share",
]


@pytest.fixture(scope="module")
def null_docid_date_sf(tmp_path_factory):
    """Null doc ids (id-keyed curation: the minhash/jaccard chain and
    the training-mix doc_id join treat them as non-participants — found
    live: a null doc_id crashed the pair kernel's int cast and leaked
    through the fused training-mix pipeline its twin's JOIN drops) and
    null dates (NULL-year groups order NULLS LAST in the yoy LAG —
    found live: the driver fold crashed sorting None years)."""
    tmp = str(tmp_path_factory.mktemp("nulldociddate"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    rng = np.random.default_rng(53)

    def inject(name, cols, frac=0.05):
        import pyarrow.compute as pc

        t = pq.read_table(os.path.join(tmp, f"{name}.parquet"))
        for col in cols:
            i = t.schema.get_field_index(col)
            arr = t.column(col).combine_chunks()
            mask = pa.array(rng.random(t.num_rows) < frac)
            t = t.set_column(i, col, pc.if_else(mask, pa.nulls(t.num_rows, arr.type), arr))
        pq.write_table(t, os.path.join(tmp, f"{name}.parquet"))

    inject("documents", ["doc_id", "source", "n_chars"])
    inject("orders", ["o_orderdate"])
    inject("lineitem", ["l_shipdate", "l_returnflag", "l_linestatus"])
    return tmp


@pytest.fixture(scope="module")
def null_docid_date_con(null_docid_date_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{null_docid_date_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", DOCID_DATE_NULL_TARGETS)
def test_docid_date_null_injected_parity(
    ray_session, null_docid_date_sf, null_docid_date_con, name
):
    res = entry.queries()[name](null_docid_date_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = null_docid_date_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1)
    ot = ot.sort_index(axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    ot = ot.sort_values(list(ot.columns)).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"
