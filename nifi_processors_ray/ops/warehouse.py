"""Remaining classic warehouse query shapes — TPC-H Q2/Q4/Q9/Q13/Q15/Q16.

Rounds out the relational surface with the six decision-support shapes
the library did not yet cover (the testdata has no partsupp table, no
ship modes and no commit/receipt dates, so Q2/Q16 substitute lineitem
as the part↔supplier relationship and Q4 uses a quantity predicate —
the SHAPES are faithful, the predicates are adapted):

- Q4  ``priority_with_large_items``: EXISTS semi-join folded into a
  grouped count — one sort exchange decides the quantifier per order.
- Q15 ``top_revenue_suppliers``: HAVING against a GLOBAL scalar (the
  max of an aggregate) — distributed argmax with a tie-set broadcast.
- Q9  ``nation_profit``: four-table chain grouped by (nation, year) —
  two chained sort exchanges, partials shrink at every hop.
- Q13 ``customer_order_distribution``: LEFT-JOIN count distribution
  INCLUDING the zero bucket (customers with no qualifying order).
- Q16 ``brand_supplier_counts``: COUNT(DISTINCT) after a join, with a
  NOT-IN exclusion set broadcast as a sorted array.
- Q2  ``cheapest_part_supplier``: per-group argmin JOIN-BACK — the
  min is computed and its achieving rows emitted in the same run pass.

Scale rules, same as ``ops/chains.py``: fact legs never broadcast
(every hop is ONE co-partitioned sort exchange via ``checked_sort``,
whose run repair guarantees whole key runs per block); genuinely tiny
dims (nation) are driver-read; Q15's tie-set broadcasts via ``ray.put``
(bounded by the argmax argument), while Q16's supplier-proportional
exclusion set runs as a distributed anti-join exchange — the
boundedness argument is documented at each call site.  Money is floored integer cents in the
identical IEEE op order as the DuckDB twins; every SUM is CAST back to
BIGINT.

Reference semantics: the NiFi reference has no joins (SURVEY §2.4);
these are the lakehouse-side analytics a CDC-fed warehouse runs
(reference parity anchor: swiftj/nifi-processors has no analog —
engine-side extension, same as ops/chains.py / ops/subqueries.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.blocks import compact_small_result, sorted_build_probe_runs
from ..functions.debug import checked_sort, null_safe_groupby_agg, null_safe_sort
from ..functions.money import discounted_floored_cents, floored_cents
from ..sources.reader import read_parquet_exchange as read_parquet_clean

# ---------------------------------------------------------------------------
# Q4 shape: order-priority counts gated by an EXISTS over lineitems
# ---------------------------------------------------------------------------

Q4_LO = "1996-01-01"
Q4_HI = "1997-01-01"
Q4_QTY = 45

PRIORITY_WITH_LARGE_ITEMS_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO}' AND o.o_orderdate < TIMESTAMP '{Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > {Q4_QTY})
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _q4_exists_side(batch: pa.Table) -> pa.Table:
    """Qualifying lineitems → distinct orderkeys (the EXISTS witness
    set), deduped per batch so the exchange ships each key once."""
    batch = batch.filter(pc.is_valid(batch.column("l_orderkey")))
    keys = pa.table({"key": batch.column("l_orderkey").cast(pa.int64())})
    g = keys.group_by(["key"]).aggregate([([], "count_all")])
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "prio": pa.nulls(n, pa.string()),
        }
    )


def _q4_orders_side(batch: pa.Table) -> pa.Table:
    # null orderkeys can never satisfy the correlated equality — drop
    batch = batch.filter(pc.is_valid(batch.column("o_orderkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "prio": batch.column("o_orderpriority"),
        }
    )


def _q4_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: the order row survives iff the run has an
    EXISTS witness; surviving priorities pre-count per block."""
    empty = pa.table(
        {"o_orderpriority": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    # Arrow group_by keeps a NULL priority as one group — SQL GROUP BY
    g = (
        pa.table({"o_orderpriority": block.column("prio").filter(pa.array(keep))})
        .group_by(["o_orderpriority"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "o_orderpriority": g.column("o_orderpriority"),
            "n": g.column("count_all").cast(pa.int64()),
        }
    )


def priority_with_large_items(sf_dir: str) -> ray.data.Dataset:
    """Order counts per priority where the order has a >45-quantity
    item (the TPC-H Q4 shape: EXISTS folded into a grouped count).
    The quantity predicate pushes into the lineitem scan; ONE sort
    exchange co-locates witnesses with their orders, so the quantifier
    is decided per run with no distinct-aggregate exchange."""
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    lo = pa.scalar(np.datetime64(Q4_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q4_HI, "us"), pa.timestamp("us"))
    witness = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        filter=pc.field("l_quantity") > Q4_QTY,
    ).map_batches(_q4_exists_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(_q4_orders_side, batch_format="pyarrow")
    partials = checked_sort(witness.union(orders), "key").map_batches(
        _q4_block, batch_format="pyarrow", batch_size=None
    )
    out = null_safe_groupby_agg(
        partials,
        "o_orderpriority",
        Sum("n", alias_name="n_orders"),
        out_types={"n_orders": pa.int64()},
    )
    out = null_safe_sort(out, ["o_orderpriority"])  # priority may be NULL
    return compact_small_result(
        out, pa.schema([("o_orderpriority", pa.string()), ("n_orders", pa.int64())])
    )


# ---------------------------------------------------------------------------
# Q15 shape: supplier(s) with the maximum window revenue
# ---------------------------------------------------------------------------

Q15_LO = "1996-01-01"
Q15_HI = "1996-04-01"

TOP_REVENUE_SUPPLIERS_SQL = f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100)
                                AS BIGINT)), 0) AS BIGINT) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}' AND l_shipdate < TIMESTAMP '{Q15_HI}'
    AND l_suppkey IS NOT NULL
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.revenue_cents
FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
WHERE r.revenue_cents = (SELECT MAX(revenue_cents) FROM r)
ORDER BY s.s_suppkey
"""


def _q15_rev_partials(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("l_suppkey")))
    t = pa.table(
        {
            "key": batch.column("l_suppkey").cast(pa.int64()),
            # fill-0 == the twin's COALESCE: a supplier whose every
            # price is NULL aggregates to 0 on both sides
            "cents": pc.fill_null(
                discounted_floored_cents(
                    batch.column("l_extendedprice"), batch.column("l_discount")
                ),
                0,
            ),
        }
    )
    g = t.group_by(["key"]).aggregate([("cents", "sum")])
    return pa.table({"key": g.column("key"), "cents": g.column("cents_sum")})


def top_revenue_suppliers(sf_dir: str) -> ray.data.Dataset:
    """Suppliers whose quarter revenue equals the GLOBAL maximum (the
    TPC-H Q15 shape: HAVING against a scalar subquery over the same
    aggregate).  Per-supplier revenue runs as combiner partials + one
    grouped exchange; the max is a distributed reduce returning one
    scalar; the winner TIE-SET (≥1 row, tiny by the argmax argument)
    is collected and pushed into the supplier scan as a key filter."""
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    lo = pa.scalar(np.datetime64(Q15_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q15_HI, "us"), pa.timestamp("us"))
    rev = null_safe_groupby_agg(
        read_parquet_clean(
            f"{sf}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        ).map_batches(_q15_rev_partials, batch_format="pyarrow"),
        "key",
        Sum("cents", alias_name="revenue_cents"),
        out_types={"revenue_cents": pa.int64()},
    ).materialize()  # consumed twice: max reduce + winner filter
    schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()), ("revenue_cents", pa.int64())]
    )
    if rev.count() == 0:  # empty window
        return ray.data.from_arrow(schema.empty_table())
    vmax = rev.max("revenue_cents")  # distributed reduce → one scalar
    winners = rev.map_batches(
        lambda b: b.filter(pc.equal(b.column("revenue_cents"), vmax)),
        batch_format="pyarrow",
    ).take_all()  # tie-set: ≥1 supplier, bounded by max-ties
    cents_by_key = {int(r["key"]): int(r["revenue_cents"]) for r in winners}
    keys = sorted(cents_by_key)

    def label(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("s_suppkey")))
        sk = np.asarray(b.column("s_suppkey").cast(pa.int64()).combine_chunks())
        return pa.table(
            {
                "s_suppkey": pa.array(sk),
                "s_name": b.column("s_name"),
                "revenue_cents": pa.array(
                    [cents_by_key[int(k)] for k in sk], pa.int64()
                ),
            }
        )

    out = read_parquet_clean(
        f"{sf}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(keys),
    ).map_batches(label, batch_format="pyarrow")
    return compact_small_result(out.sort("s_suppkey"), schema)


# ---------------------------------------------------------------------------
# Q9 shape: profit by supplier nation and ship year over a 4-table chain
# ---------------------------------------------------------------------------

Q9_PART_TYPE = "PROMO"

NATION_PROFIT_SQL = f"""
SELECT n.n_name, CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100)
                              AS BIGINT)), 0) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = '{Q9_PART_TYPE}' AND l.l_shipdate IS NOT NULL
GROUP BY 1, 2
ORDER BY n.n_name, l_year DESC
"""


def _q9_part_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("p_partkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("p_partkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "supp": pa.nulls(n, pa.int64()),
            "year": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q9_lineitem_side(batch: pa.Table) -> pa.Table:
    """Probe side pre-aggregated per (partkey, suppkey, year)."""
    batch = batch.filter(
        pc.and_(
            pc.and_(
                pc.is_valid(batch.column("l_partkey")),
                pc.is_valid(batch.column("l_suppkey")),
            ),
            pc.is_valid(batch.column("l_shipdate")),
        )
    )
    year = np.asarray(
        batch.column("l_shipdate").cast(pa.timestamp("us")).combine_chunks()
    ).astype("datetime64[Y]").astype(np.int64) + 1970
    t = pa.table(
        {
            "key": batch.column("l_partkey").cast(pa.int64()),
            "supp": batch.column("l_suppkey").cast(pa.int64()),
            "year": pa.array(year, pa.int64()),
            "cents": pc.fill_null(
                discounted_floored_cents(
                    batch.column("l_extendedprice"), batch.column("l_discount")
                ),
                0,
            ),
        }
    )
    g = t.group_by(["key", "supp", "year"]).aggregate([("cents", "sum")])
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "supp": g.column("supp"),
            "year": g.column("year"),
            "cents": g.column("cents_sum"),
        }
    )


def _q9_hop1_block(block: pa.Table) -> pa.Table:
    """Per partkey run: partials survive iff the part passed the type
    filter; re-combined per (suppkey, year) before the next exchange."""
    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "year": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    t = pa.table(
        {
            "key": block.column("supp").filter(pa.array(keep)),
            "year": block.column("year").filter(pa.array(keep)),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )
    g = t.group_by(["key", "year"]).aggregate([("cents", "sum")])
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "year": g.column("year"),
            "cents": g.column("cents_sum"),
        }
    )


def _q9_supp_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(
        # INNER chain: a supplier with a NULL nationkey can never reach
        # nation — mirror the join's null drop on the DIM side here
        pc.and_(
            pc.is_valid(batch.column("s_suppkey")),
            pc.is_valid(batch.column("s_nationkey")),
        )
    )
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "year": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "nat": batch.column("s_nationkey").cast(pa.int64()),
        }
    )


def _q9_hop2_block(block: pa.Table) -> pa.Table:
    """Per suppkey run: attach the supplier's nationkey, reduce to
    per (nation, year) partials."""
    empty = pa.table(
        {
            "nat": pa.array([], pa.int64()),
            "year": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    nat = np.asarray(pc.fill_null(block.column("nat"), -1).combine_chunks())
    t = pa.table(
        {
            "nat": pa.array(nat[build_idx[keep]]),
            "year": block.column("year").filter(pa.array(keep)),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )
    g = t.group_by(["nat", "year"]).aggregate([("cents", "sum")])
    return pa.table(
        {"nat": g.column("nat"), "year": g.column("year"), "cents": g.column("cents_sum")}
    )


def nation_profit(sf_dir: str) -> ray.data.Dataset:
    """Profit by supplier nation and ship year for one part type (the
    TPC-H Q9 shape): lineitem ⋈ part(filter) ⋈ supplier ⋈ nation over
    TWO chained sort exchanges — partkey (semi-filter), then suppkey
    (nation attach) — with per-(nation, year) partials leaving the last
    hop.  nation (25 rows) is driver-read and broadcast for labeling."""
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    sf = sf_dir.rstrip("/")
    part = read_parquet_clean(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == Q9_PART_TYPE,
    ).map_batches(_q9_part_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(_q9_lineitem_side, batch_format="pyarrow")
    supp_partials = checked_sort(part.union(items), "key").map_batches(
        _q9_hop1_block, batch_format="pyarrow", batch_size=None
    )
    supp = read_parquet_clean(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_q9_supp_side, batch_format="pyarrow")

    def pad_nat(b: pa.Table) -> pa.Table:
        return b.append_column("nat", pa.nulls(b.num_rows, pa.int64()))

    nation_partials = checked_sort(
        supp.union(supp_partials.map_batches(pad_nat, batch_format="pyarrow")), "key"
    ).map_batches(_q9_hop2_block, batch_format="pyarrow", batch_size=None)
    agg = null_safe_groupby_agg(
        nation_partials,
        ["nat", "year"],
        Sum("cents", alias_name="profit_cents"),
        out_types={"profit_cents": pa.int64()},
    )
    names = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )  # 25 rows — driver-read tiny dim
    # cast the dim key UP to int64 once at read time and probe with the
    # int64 group key (the convention in ops/chains.py) — casting the
    # probe DOWN to the dim's physical type would error if the dim were
    # ever written with int64 keys; a null dim key can never match (SQL
    # join equality), so drop it from the value_set
    names = names.filter(pc.is_valid(names.column("n_nationkey")))
    names = names.set_column(
        names.schema.get_field_index("n_nationkey"),
        "n_nationkey",
        names.column("n_nationkey").cast(pa.int64()),
    )
    names_ref = ray.put(names)

    def label(b: pa.Table) -> pa.Table:
        nm = ray.get(names_ref) if isinstance(names_ref, ray.ObjectRef) else names_ref
        idx = pc.index_in(b.column("nat"), value_set=nm.column("n_nationkey"))
        # INNER join to nation: DANGLING nationkeys drop here — but a
        # matched nation whose n_name is NULL keeps its group (SQL emits
        # it with a NULL name), so the drop tests the index_in HIT, not
        # the name's validity
        hit = pc.is_valid(idx)
        b = b.filter(hit)
        b = b.append_column("n_name", nm.column("n_name").take(idx.filter(hit)))
        return b.select(["n_name", "year", "profit_cents"]).rename_columns(
            ["n_name", "l_year", "profit_cents"]
        )

    out = null_safe_sort(  # n_name may be NULL (kept group, see label)
        agg.map_batches(label, batch_format="pyarrow"),
        ["n_name", "l_year"],
        descending=[False, True],
    )
    return compact_small_result(
        out,
        pa.schema(
            [("n_name", pa.string()), ("l_year", pa.int64()), ("profit_cents", pa.int64())]
        ),
    )


# ---------------------------------------------------------------------------
# Q13 shape: distribution of per-customer order counts (zero included)
# ---------------------------------------------------------------------------

Q13_EXCLUDED_PRIORITY = "1-URGENT"

CUSTOMER_ORDER_DISTRIBUTION_SQL = f"""
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  WHERE c.c_custkey IS NOT NULL
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def _q13_cust_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("c_custkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "n": pa.array(np.zeros(n, dtype=np.int64)),
        }
    )


def _q13_order_partials(batch: pa.Table) -> pa.Table:
    # the join condition o_orderpriority <> X is NULL (no match) for a
    # NULL priority; COUNT(o_orderkey) skips NULL orderkeys — both drops
    # mirrored here; null custkeys can never match a customer
    prio = batch.column("o_orderpriority")
    batch = batch.filter(
        pc.and_(
            pc.and_(
                pc.is_valid(batch.column("o_custkey")),
                pc.is_valid(batch.column("o_orderkey")),
            ),
            pc.and_(pc.is_valid(prio), pc.not_equal(prio, Q13_EXCLUDED_PRIORITY)),
        )
    )
    g = (
        pa.table({"key": batch.column("o_custkey").cast(pa.int64())})
        .group_by(["key"])
        .aggregate([([], "count_all")])
    )
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "n": g.column("count_all").cast(pa.int64()),
        }
    )


def _q13_block(block: pa.Table) -> pa.Table:
    """Per custkey run with a customer build row: the run's order-count
    partials sum to the customer's count (0 when none — the LEFT JOIN
    zero bucket).  Per-block histogram partials leave the kernel."""
    empty = pa.table(
        {"c_count": pa.array([], pa.int64()), "custdist": pa.array([], pa.int64())}
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, _ = sorted_build_probe_runs(block)
    has_build = side[starts] == 0
    if not has_build.any():
        return empty
    n_col = np.asarray(pc.fill_null(block.column("n"), 0).combine_chunks())
    run_counts = np.add.reduceat(n_col, starts)  # build rows carry n=0
    g = (
        pa.table({"c_count": pa.array(run_counts[has_build].astype(np.int64))})
        .group_by(["c_count"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {"c_count": g.column("c_count"), "custdist": g.column("count_all").cast(pa.int64())}
    )


def customer_order_distribution(sf_dir: str) -> ray.data.Dataset:
    """How many customers placed k non-urgent orders, INCLUDING k = 0
    (the TPC-H Q13 shape: LEFT-JOIN count distribution).  Order counts
    pre-aggregate per batch; ONE sort exchange co-locates them with
    customer keys so the zero bucket falls out of runs with no probe
    rows; a second tiny grouped exchange folds the histogram."""
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    cust = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey"]
    ).map_batches(_q13_cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderpriority"],
    ).map_batches(_q13_order_partials, batch_format="pyarrow")
    hist_partials = checked_sort(cust.union(orders), "key").map_batches(
        _q13_block, batch_format="pyarrow", batch_size=None
    )
    out = null_safe_groupby_agg(
        hist_partials,
        "c_count",
        Sum("custdist", alias_name="custdist"),
        out_types={"custdist": pa.int64()},
    ).sort(["custdist", "c_count"], descending=[True, True])
    return compact_small_result(
        out, pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct suppliers per (brand, size) with a NOT-IN exclusion
# ---------------------------------------------------------------------------

Q16_SIZES = (1, 14, 23, 45)
Q16_ACCTBAL_FLOOR = 1500.0  # the "complaints" analog: low-balance suppliers

BRAND_SUPPLIER_COUNTS_SQL = f"""
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_size IN {Q16_SIZES}
  AND l.l_suppkey IS NOT NULL
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < {Q16_ACCTBAL_FLOOR}
                            AND s_suppkey IS NOT NULL)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def _q16_part_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("p_partkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("p_partkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "supp": pa.nulls(n, pa.int64()),
            "p_brand": batch.column("p_brand"),
            "p_size": batch.column("p_size").cast(pa.int64()),
        }
    )


def _q16_item_side(batch: pa.Table) -> pa.Table:
    """(partkey, suppkey) pairs, deduped per batch."""
    batch = batch.filter(
        pc.and_(
            pc.is_valid(batch.column("l_partkey")),
            pc.is_valid(batch.column("l_suppkey")),
        )
    )
    g = (
        pa.table(
            {
                "key": batch.column("l_partkey").cast(pa.int64()),
                "supp": batch.column("l_suppkey").cast(pa.int64()),
            }
        )
        .group_by(["key", "supp"])
        .aggregate([([], "count_all")])
    )
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "supp": g.column("supp"),
            "p_brand": pa.nulls(n, pa.string()),
            "p_size": pa.nulls(n, pa.int64()),
        }
    )


def _q16_block(block: pa.Table) -> pa.Table:
    """Per partkey run: tag surviving (part, supplier) pairs with the
    part's brand/size; dedupe per block (the run holds the whole part,
    so block-local dedupe is global for the partkey dimension)."""
    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "supp": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    bidx = pa.array(build_idx[keep].astype(np.int64))
    g = (
        pa.table(
            {
                "p_brand": block.column("p_brand").take(bidx),
                "p_size": block.column("p_size").take(bidx),
                "supp": block.column("supp").filter(pa.array(keep)),
            }
        )
        .group_by(["p_brand", "p_size", "supp"])
        .aggregate([([], "count_all")])
    )
    return g.drop_columns(["count_all"])


def _q16_excl_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("s_suppkey")))
    g = (
        pa.table({"key": batch.column("s_suppkey").cast(pa.int64())})
        .group_by(["key"])
        .aggregate([([], "count_all")])
    )
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "p_brand": pa.nulls(n, pa.string()),
            "p_size": pa.nulls(n, pa.int64()),
        }
    )


def _q16_anti_block(block: pa.Table) -> pa.Table:
    """Per suppkey run: distinct (brand, size, supplier) rows survive
    iff the run has NO excluded-supplier build row (the NOT IN)."""
    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "supp": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx < 0)
    if not keep.any():
        return empty
    return pa.table(
        {
            "p_brand": block.column("p_brand").filter(pa.array(keep)),
            "p_size": block.column("p_size").filter(pa.array(keep)),
            "supp": pa.array(key[keep].astype(np.int64)),
        }
    )


def brand_supplier_counts(sf_dir: str) -> ray.data.Dataset:
    """Distinct suppliers per (brand, size) for selected part sizes,
    excluding low-balance suppliers (the TPC-H Q16 shape: COUNT
    DISTINCT after a join with a NOT-IN exclusion).  The exclusion set
    is supplier-cardinality-proportional, so it is NOT broadcast: the
    NOT IN runs as a distributed ANTI-JOIN exchange on suppkey against
    the already-distinct (brand, size, supplier) rows.  Three grouped/
    sort exchanges total — partkey tag, (brand, size, supplier)
    distinct, suppkey anti-join — each moving only deduped partials;
    the final per-(brand, size) count is exact because each surviving
    (brand, size, supplier) occurs exactly once."""
    from ray.data.aggregate import Count

    sf = sf_dir.rstrip("/")
    part = read_parquet_clean(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_size").isin(list(Q16_SIZES)),
    ).map_batches(_q16_part_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(_q16_item_side, batch_format="pyarrow")
    tagged = checked_sort(part.union(items), "key").map_batches(
        _q16_block, batch_format="pyarrow", batch_size=None
    )
    distinct = null_safe_groupby_agg(
        tagged,
        ["p_brand", "p_size", "supp"],
        Count(alias_name="__n"),
        out_types={"__n": pa.int64()},
    )

    def _distinct_probe(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "key": b.column("supp").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size"),
            }
        )

    excl = read_parquet_clean(
        f"{sf}/supplier.parquet",
        columns=["s_suppkey", "s_acctbal"],
        filter=pc.field("s_acctbal") < Q16_ACCTBAL_FLOOR,
    ).map_batches(_q16_excl_side, batch_format="pyarrow")
    surviving = checked_sort(
        excl.union(
            distinct.drop_columns(["__n"]).map_batches(
                _distinct_probe, batch_format="pyarrow"
            )
        ),
        "key",
    ).map_batches(_q16_anti_block, batch_format="pyarrow", batch_size=None)
    out = null_safe_groupby_agg(
        surviving,
        ["p_brand", "p_size"],
        Count(alias_name="supplier_cnt"),
        out_types={"supplier_cnt": pa.int64()},
    )
    out = null_safe_sort(  # p_brand may be NULL (kept as its own group)
        out, ["supplier_cnt", "p_brand", "p_size"], descending=[True, False, False]
    )
    return compact_small_result(
        out,
        pa.schema(
            [("p_brand", pa.string()), ("p_size", pa.int64()), ("supplier_cnt", pa.int64())]
        ),
    )


# ---------------------------------------------------------------------------
# Q2 shape: per-part argmin — the supplier(s) at the minimum price
# ---------------------------------------------------------------------------

Q2_SIZE_LO, Q2_SIZE_HI = 10, 15
Q2_PART_TYPE = "ECONOMY"

CHEAPEST_PART_SUPPLIER_SQL = f"""
WITH f AS (
  SELECT p_partkey FROM part
  WHERE p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI} AND p_type = '{Q2_PART_TYPE}'
),
l AS (
  SELECT l_partkey, l_suppkey, CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN f ON l_partkey = p_partkey
  WHERE l_suppkey IS NOT NULL AND l_extendedprice IS NOT NULL
),
m AS (SELECT l_partkey, MIN(cents) AS min_cents FROM l GROUP BY 1)
SELECT DISTINCT l.l_partkey AS p_partkey, l.l_suppkey AS s_suppkey,
       s.s_name, m.min_cents AS price_cents
FROM l
JOIN m ON l.l_partkey = m.l_partkey AND l.cents = m.min_cents
JOIN supplier s ON s.s_suppkey = l.l_suppkey
ORDER BY p_partkey, s_suppkey
"""

_INT64_MAX = np.iinfo(np.int64).max


def _q2_part_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("p_partkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("p_partkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "supp": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q2_item_side(batch: pa.Table) -> pa.Table:
    """Per-batch (partkey, suppkey) min-price partials.  NULL prices
    drop (SQL MIN skips them and a NULL can never equal the min)."""
    cents = floored_cents(batch.column("l_extendedprice"))
    batch = batch.append_column("__cents", cents).filter(
        pc.and_(
            pc.and_(
                pc.is_valid(batch.column("l_partkey")),
                pc.is_valid(batch.column("l_suppkey")),
            ),
            pc.is_valid(cents),
        )
    )
    g = (
        pa.table(
            {
                "key": batch.column("l_partkey").cast(pa.int64()),
                "supp": batch.column("l_suppkey").cast(pa.int64()),
                "cents": batch.column("__cents"),
            }
        )
        .group_by(["key", "supp"])
        .aggregate([("cents", "min")])
    )
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "supp": g.column("supp"),
            "cents": g.column("cents_min"),
        }
    )


def _q2_argmin_block(block: pa.Table) -> pa.Table:
    """Per partkey run: compute the run min and emit the probe rows
    achieving it IN THE SAME PASS (argmin join-back without a second
    exchange) — build rows mask to int64-max so they never win."""
    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "partkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    cents = np.asarray(pc.fill_null(block.column("cents"), _INT64_MAX).combine_chunks())
    masked = np.where(side == 0, _INT64_MAX, cents)
    run_id = np.repeat(np.arange(len(starts)), run_len)
    run_min = np.minimum.reduceat(masked, starts)
    keep = (side == 1) & (build_idx >= 0) & (masked == run_min[run_id]) & (
        masked != _INT64_MAX
    )
    if not keep.any():
        return empty
    # dedupe (part, supp): per-batch min partials can repeat across
    # batches; the run holds the whole part, so this dedupe is global
    g = (
        pa.table(
            {
                "key": block.column("supp").filter(pa.array(keep)),
                "partkey": pa.array(key[keep].astype(np.int64)),
                "cents": pa.array(cents[keep]),
            }
        )
        .group_by(["key", "partkey", "cents"])
        .aggregate([([], "count_all")])
    )
    n = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "partkey": g.column("partkey"),
            "cents": g.column("cents"),
            "s_name": pa.nulls(n, pa.string()),
        }
    )


def _q2_supp_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("s_suppkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "partkey": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "s_name": batch.column("s_name"),
        }
    )


def _q2_name_block(block: pa.Table) -> pa.Table:
    """Per suppkey run: label each winning (part, supplier) pair."""
    empty = pa.table(
        {
            "p_partkey": pa.array([], pa.int64()),
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "price_cents": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    bidx = pa.array(build_idx[keep].astype(np.int64))
    return pa.table(
        {
            "p_partkey": block.column("partkey").filter(pa.array(keep)),
            "s_suppkey": pa.array(key[keep].astype(np.int64)),
            "s_name": block.column("s_name").take(bidx),
            "price_cents": block.column("cents").filter(pa.array(keep)),
        }
    )


def cheapest_part_supplier(sf_dir: str) -> ray.data.Dataset:
    """For each part in a size/type band, the supplier(s) achieving the
    MINIMUM observed price (the TPC-H Q2 shape: per-group argmin with a
    join-back for the winner's attributes).  The min and its achieving
    rows are decided in ONE partkey run pass (no separate min exchange
    + re-join); a second suppkey exchange attaches supplier names."""
    sf = sf_dir.rstrip("/")
    part = read_parquet_clean(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_size", "p_type"],
        filter=(pc.field("p_size") >= Q2_SIZE_LO)
        & (pc.field("p_size") <= Q2_SIZE_HI)
        & (pc.field("p_type") == Q2_PART_TYPE),
    ).map_batches(_q2_part_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(_q2_item_side, batch_format="pyarrow")
    winners = checked_sort(part.union(items), "key").map_batches(
        _q2_argmin_block, batch_format="pyarrow", batch_size=None
    )
    supp = read_parquet_clean(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_q2_supp_side, batch_format="pyarrow")
    named = checked_sort(supp.union(winners), "key").map_batches(
        _q2_name_block, batch_format="pyarrow", batch_size=None
    )
    out = named.sort(["p_partkey", "s_suppkey"])
    return compact_small_result(
        out,
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("price_cents", pa.int64()),
            ]
        ),
    )
