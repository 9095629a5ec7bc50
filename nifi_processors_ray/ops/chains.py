"""Deep multi-hop join chains — the TPC-H Q5 / Q10 shapes.

These compose the engine's one-sort-exchange join primitive
(``ops/joins.py``) into 3-hop chains over five/six tables, the deepest
relational pipelines in the library.  The scale rules they demonstrate:

- FACT legs (orders, lineitem, and — at SF100k — supplier and customer)
  never broadcast: each hop is ONE co-partitioned sort exchange whose
  probe side ships per-batch partials (the combiner), so exchange volume
  shrinks at every hop instead of growing.
- The cross-chain equality ``c_nationkey = s_nationkey`` (Q5's defining
  constraint) rides along as a small payload column through the chain
  and is applied block-locally at the LAST hop — no extra exchange.
- Genuinely tiny dims (nation: 25 rows, region: 5) are driver-read and
  broadcast via ``ray.put``; their predicates collapse to key-set
  filters pushed into the parquet scans.

Reference semantics: the NiFi reference has no joins (SURVEY §2.4);
these are the lakehouse-side analytics a CDC-fed warehouse runs.
Numeric determinism vs the twins: revenue is floored cents (identical
IEEE double op order both sides), every SUM is CAST back to BIGINT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.blocks import sorted_build_probe_runs
from ..functions.bloom import bloom_member, build_key_bloom
from ..functions.debug import checked_sort
from ..functions.money import discounted_floored_cents
from ..sources.reader import read_parquet_exchange as read_parquet_clean

# ---------------------------------------------------------------------------
# Q5 shape: local-supplier volume per nation
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_LO = "1996-01-01"
Q5_HI = "1997-01-01"

LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n.n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q5_HI}'
GROUP BY n.n_name
ORDER BY revenue_cents DESC, n.n_name
"""


def _region_nation_keys(sf_dir: str, region: str) -> tuple[list[int], pa.Table]:
    """Driver-side read of the two genuinely tiny dims: the region's
    nation keys (pushed into the customer/supplier scans) and the
    (n_nationkey, n_name) lookup for the final label."""
    import pyarrow.parquet as pq

    sf = sf_dir.rstrip("/")
    nation = pq.read_table(f"{sf}/nation.parquet")
    region_t = pq.read_table(f"{sf}/region.parquet")
    rkey = region_t.filter(pc.equal(region_t.column("r_name"), region)).column(
        "r_regionkey"
    )
    # pc.is_in matches a null probe to a null IN the value set (verified
    # Arrow behavior); SQL join equality never does — drop null r keys
    rkey = pc.drop_null(rkey)
    in_region = nation.filter(pc.is_in(nation.column("n_regionkey"), value_set=rkey))
    # a null n_nationkey can never be joined (SQL NULL equality), and
    # in an index_in value_set it would MATCH null probe keys — drop it
    in_region = in_region.filter(pc.is_valid(in_region.column("n_nationkey")))
    keys = in_region.column("n_nationkey").cast(pa.int64())
    names = pa.table(
        {"n_nationkey": keys, "n_name": in_region.column("n_name")}
    )
    return keys.to_pylist(), names


def _q5_cust_side(batch: pa.Table) -> pa.Table:
    """Hop-1 build: in-region customers → (custkey, their nationkey)."""
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_nat": batch.column("c_nationkey").cast(pa.int64()),
            "o_orderkey": pa.nulls(n, pa.int64()),
        }
    )


def _q5_orders_side(batch: pa.Table) -> pa.Table:
    """Hop-1 probe: date-filtered orders keyed by custkey."""
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_custkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "c_nat": pa.nulls(n, pa.int64()),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
        }
    )


def _q5_hop1_block(block: pa.Table) -> pa.Table:
    """Per custkey run (unique build key): emit each probe order tagged
    with the customer's nationkey."""
    empty = pa.table(
        {"o_orderkey": pa.array([], pa.int64()), "c_nat": pa.array([], pa.int64())}
    )
    n = block.num_rows
    if n == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    c_nat = np.asarray(pc.fill_null(block.column("c_nat"), -1).combine_chunks())
    return pa.table(
        {
            "o_orderkey": block.column("o_orderkey").filter(pa.array(keep)),
            "c_nat": pa.array(c_nat[build_idx[keep]]),
        }
    )


def _q5_order_build_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_nat": batch.column("c_nat"),
            "suppkey": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q5_lineitem_side(batch: pa.Table, bloom_ref=None) -> pa.Table:
    """Hop-2 probe pre-aggregated per (orderkey, suppkey) in the batch.

    ``bloom_ref``: semijoin reduction — lineitems whose orderkey is
    definitely NOT among hop-1 survivors (the date-filtered in-region
    orders) are dropped BEFORE the exchange, cutting hop-2 shuffle
    volume by the order-window selectivity; false positives are dropped
    by the join itself, so the filter can never change the result."""
    if bloom_ref is not None:
        bloom = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        key_col = batch.column("l_orderkey").cast(pa.int64()).combine_chunks()
        # null keys never join (INNER semantics) and would degrade the
        # numpy view to float64+NaN — drop them with the bloom misses
        valid = np.asarray(pc.is_valid(key_col))
        keys = np.asarray(pc.fill_null(key_col, 0))
        batch = batch.filter(pa.array(valid & bloom_member(keys, bloom)))
    t = pa.table(
        {
            "key": batch.column("l_orderkey").cast(pa.int64()),
            "suppkey": batch.column("l_suppkey").cast(pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )
    g = t.group_by(["key", "suppkey"]).aggregate([("cents", "sum")])
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "c_nat": pa.nulls(m, pa.int64()),
            "suppkey": g.column("suppkey"),
            "cents": g.column("cents_sum"),
        }
    )


def _q5_hop2_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: tag lineitem partials with the order's customer
    nation, then re-combine block-locally per (suppkey, c_nat) — the
    exchange for hop 3 ships supplier-level partials, not lineitems."""
    empty = pa.table(
        {
            "suppkey": pa.array([], pa.int64()),
            "c_nat": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    c_nat = np.asarray(pc.fill_null(block.column("c_nat"), -1).combine_chunks())
    t = pa.table(
        {
            "suppkey": block.column("suppkey").filter(pa.array(keep)),
            "c_nat": pa.array(c_nat[build_idx[keep]]),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )
    g = t.group_by(["suppkey", "c_nat"]).aggregate([("cents", "sum")])
    return pa.table(
        {
            "suppkey": g.column("suppkey"),
            "c_nat": g.column("c_nat"),
            "cents": g.column("cents_sum"),
        }
    )


def _q5_supp_side(batch: pa.Table) -> pa.Table:
    """Hop-3 build: in-region suppliers → (suppkey, their nationkey)."""
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "s_nat": batch.column("s_nationkey").cast(pa.int64()),
            "c_nat": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q5_partials_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("suppkey"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "s_nat": pa.nulls(n, pa.int64()),
            "c_nat": batch.column("c_nat"),
            "cents": batch.column("cents"),
        }
    )


def _q5_hop3_block(block: pa.Table) -> pa.Table:
    """Per suppkey run: apply the chain-spanning LOCAL constraint
    (customer nation == supplier nation) block-locally, then reduce to
    per-nation revenue partials — ≤|nations-in-region| rows leave."""
    empty = pa.table(
        {
            "n_nationkey": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    s_nat = np.asarray(pc.fill_null(block.column("s_nat"), -1).combine_chunks())
    c_nat = np.asarray(pc.fill_null(block.column("c_nat"), -2).combine_chunks())
    keep = (side == 1) & (build_idx >= 0)
    keep &= np.where(build_idx >= 0, s_nat[np.maximum(build_idx, 0)], -1) == c_nat
    if not keep.any():
        return empty
    nat = s_nat[build_idx[keep]]
    cents = np.asarray(pc.fill_null(block.column("cents"), 0).combine_chunks())[keep]
    order = np.argsort(nat, kind="stable")
    nat_sorted = nat[order]
    cents_sorted = cents[order]
    run_start = np.concatenate([[True], nat_sorted[1:] != nat_sorted[:-1]])
    idx = np.nonzero(run_start)[0]
    sums = np.add.reduceat(cents_sorted, idx)
    return pa.table(
        {
            "n_nationkey": pa.array(nat_sorted[idx].astype(np.int64)),
            "revenue_cents": pa.array(sums.astype(np.int64)),
        }
    )


def local_supplier_volume(sf_dir: str, *, use_bloom: bool = True) -> ray.data.Dataset:
    """Local-supplier volume per nation (the TPC-H Q5 shape): revenue
    from in-region customers buying from suppliers of their OWN nation,
    over one order year — six tables, THREE chained sort exchanges:

    1. custkey: region-filtered customers semi-tag date-filtered orders
       with the customer's nationkey;
    2. orderkey: surviving orders meet per-(orderkey, suppkey) lineitem
       cents partials; re-combined per (suppkey, customer-nation);
    3. suppkey: supplier nationkeys join, and the chain-spanning
       ``c_nationkey = s_nationkey`` equality is applied block-locally —
       only per-nation revenue partials leave the last hop.

    nation/region (25 + 5 rows) are driver-read; their region predicate
    is pushed into the customer and supplier scans as a key-set filter.
    """
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    nat_keys, names = _region_nation_keys(sf, Q5_REGION)
    lo = pa.scalar(np.datetime64(Q5_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q5_HI, "us"), pa.timestamp("us"))

    cust = read_parquet_clean(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(nat_keys),
    ).map_batches(_q5_cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(_q5_orders_side, batch_format="pyarrow")
    tagged_orders = checked_sort(cust.union(orders), "key").map_batches(
        _q5_hop1_block, batch_format="pyarrow", batch_size=None
    ).materialize()  # consumed twice: bloom build + hop-2 build side

    # semijoin reduction: only lineitems of surviving orders reach the
    # hop-2 exchange (fixed-size bloom — see functions/bloom.py);
    # use_bloom=False is the equivalence knob the tests compare against
    bloom_ref = build_key_bloom(tagged_orders, "o_orderkey") if use_bloom else None
    build2 = tagged_orders.map_batches(_q5_order_build_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        _q5_lineitem_side, batch_format="pyarrow", fn_kwargs={"bloom_ref": bloom_ref}
    )
    supp_partials = checked_sort(build2.union(items), "key").map_batches(
        _q5_hop2_block, batch_format="pyarrow", batch_size=None
    )

    supp = read_parquet_clean(
        f"{sf}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(nat_keys),
    ).map_batches(_q5_supp_side, batch_format="pyarrow")
    probe3 = supp_partials.map_batches(_q5_partials_side, batch_format="pyarrow")
    nation_partials = checked_sort(supp.union(probe3), "key").map_batches(
        _q5_hop3_block, batch_format="pyarrow", batch_size=None
    )

    agg = nation_partials.groupby("n_nationkey").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents")
    )
    names_ref = ray.put(names)

    def label(b: pa.Table) -> pa.Table:
        nm = ray.get(names_ref) if isinstance(names_ref, ray.ObjectRef) else names_ref
        idx = pc.index_in(b.column("n_nationkey"), value_set=nm.column("n_nationkey"))
        return pa.table(
            {
                "n_name": nm.column("n_name").take(idx),
                "revenue_cents": b.column("revenue_cents"),
            }
        )

    out = agg.map_batches(label, batch_format="pyarrow").sort(
        ["revenue_cents", "n_name"], descending=[True, False]
    )
    # ≤ |nations-in-region| rows by construction: compact so an empty
    # predicate window still presents the full output schema
    from ..functions.blocks import compact_small_result

    return compact_small_result(
        out, pa.schema([("n_name", pa.string()), ("revenue_cents", pa.int64())])
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue per customer (top 20)
# ---------------------------------------------------------------------------

Q10_LO = "1996-01-01"
Q10_HI = "1996-04-01"
Q10_TOP = 20

RETURNED_ITEM_REVENUE_SQL = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q10_HI}'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT {Q10_TOP}
"""


def _q10_order_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "custkey": batch.column("o_custkey").cast(pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q10_lineitem_side(batch: pa.Table, bloom_ref=None) -> pa.Table:
    """Returned lineitems pre-aggregated per orderkey in the batch (the
    returnflag predicate is pushed into the scan; ``bloom_ref`` drops
    rows whose order is outside the quarter before the exchange — the
    same always-correct semijoin reduction as the Q5 chain)."""
    if bloom_ref is not None:
        bloom = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        key_col = batch.column("l_orderkey").cast(pa.int64()).combine_chunks()
        valid = np.asarray(pc.is_valid(key_col))
        keys = np.asarray(pc.fill_null(key_col, 0))
        batch = batch.filter(pa.array(valid & bloom_member(keys, bloom)))
    t = pa.table(
        {
            "key": batch.column("l_orderkey").cast(pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )
    g = t.group_by(["key"]).aggregate([("cents", "sum")])
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "custkey": pa.nulls(m, pa.int64()),
            "cents": g.column("cents_sum"),
        }
    )


def _q10_hop1_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: fold returned-item cents onto the order's
    custkey, pre-aggregated per custkey before the next exchange."""
    empty = pa.table(
        {"custkey": pa.array([], pa.int64()), "cents": pa.array([], pa.int64())}
    )
    n = block.num_rows
    if n == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    cust = np.asarray(pc.fill_null(block.column("custkey"), -1).combine_chunks())
    t = pa.table(
        {
            "custkey": pa.array(cust[build_idx[keep]]),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )
    g = t.group_by(["custkey"]).aggregate([("cents", "sum")])
    return pa.table({"custkey": g.column("custkey"), "cents": g.column("cents_sum")})


def _q10_cust_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_name": batch.column("c_name"),
            "c_nat": batch.column("c_nationkey").cast(pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q10_rev_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("custkey"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "c_name": pa.nulls(n, pa.string()),
            "c_nat": pa.nulls(n, pa.int64()),
            "cents": batch.column("cents"),
        }
    )


def _q10_hop2_block(block: pa.Table) -> pa.Table:
    """Per custkey run (unique build key): one output row per customer
    with ≥1 revenue partial — the run holds ALL of the customer's
    partials, so the sum is final (no further aggregate exchange)."""
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "c_nat": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block, key, side, starts, run_len, _ = sorted_build_probe_runs(block)
    has_build = side[starts] == 0
    has_probe = run_len > has_build.astype(np.int64)
    cents = np.asarray(pc.fill_null(block.column("cents"), 0).combine_chunks())
    run_cents = np.add.reduceat(cents, starts)
    keep = has_build & has_probe
    if not keep.any():
        return empty
    idx = pa.array(starts[keep].astype(np.int64))
    return pa.table(
        {
            "c_custkey": pa.array(key[starts[keep]].astype(np.int64)),
            "c_name": block.column("c_name").take(idx),
            "c_nat": block.column("c_nat").take(idx),
            "revenue_cents": pa.array(run_cents[keep].astype(np.int64)),
        }
    )


def returned_item_revenue(sf_dir: str, n_top: int = Q10_TOP, *, use_bloom: bool = True) -> ray.data.Dataset:
    """Top-``n_top`` customers by returned-item revenue in one quarter
    (the TPC-H Q10 shape): orders ⋈ lineitem('R') ⋈ customer ⋈ nation
    through two chained sort exchanges (orderkey, then custkey), with
    the 25-row nation dim broadcast for the final label.  Each hop's
    probe side ships per-batch cents partials; the final top-k sort sees
    one row per customer with returns, never a lineitem."""
    import pyarrow.parquet as pq

    sf = sf_dir.rstrip("/")
    lo = pa.scalar(np.datetime64(Q10_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q10_HI, "us"), pa.timestamp("us"))

    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(_q10_order_side, batch_format="pyarrow").materialize()
    bloom_ref = build_key_bloom(orders, "key") if use_bloom else None
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(
        _q10_lineitem_side, batch_format="pyarrow", fn_kwargs={"bloom_ref": bloom_ref}
    )
    rev = checked_sort(orders.union(items), "key").map_batches(
        _q10_hop1_block, batch_format="pyarrow", batch_size=None
    )

    cust = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    ).map_batches(_q10_cust_side, batch_format="pyarrow")
    probe = rev.map_batches(_q10_rev_side, batch_format="pyarrow")
    per_cust = checked_sort(cust.union(probe), "key").map_batches(
        _q10_hop2_block, batch_format="pyarrow", batch_size=None
    )

    nation = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    # null keys can never join; in the value_set they'd match null c_nat
    nation = nation.filter(pc.is_valid(nation.column("n_nationkey")))
    nation = nation.set_column(
        0, "n_nationkey", nation.column("n_nationkey").cast(pa.int64())
    )
    nation_ref = ray.put(nation)

    def label(b: pa.Table) -> pa.Table:
        nm = ray.get(nation_ref) if isinstance(nation_ref, ray.ObjectRef) else nation_ref
        idx = pc.index_in(b.column("c_nat"), value_set=nm.column("n_nationkey"))
        # INNER join to nation: a null or dangling c_nationkey drops the
        # CUSTOMER ROW (SQL), not just its label — filter on the match
        hit = pc.is_valid(idx)
        b = b.filter(hit)
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "n_name": nm.column("n_name").take(idx.filter(hit)),
                "revenue_cents": b.column("revenue_cents"),
            }
        )

    out = (
        per_cust.map_batches(label, batch_format="pyarrow")
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(n_top)
    )
    # ≤ n_top rows after the limit: compact so an empty predicate
    # window still presents the full output schema
    from ..functions.blocks import compact_small_result

    return compact_small_result(
        out,
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("n_name", pa.string()),
                ("revenue_cents", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customers (HAVING over a join)
# ---------------------------------------------------------------------------

Q18_QTY = 250
Q18_TOP = 20

LARGE_VOLUME_CUSTOMERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_cents,
       b.total_qty
FROM big b
JOIN orders o   ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY price_cents DESC, o.o_orderkey
LIMIT {Q18_TOP}
"""


def _q18_qty_partials(batch: pa.Table) -> pa.Table:
    # null orderkeys can never join (INNER semantics) and would crash
    # the big-set int64 materialization — drop them here, like the twin
    batch = batch.filter(pc.is_valid(batch.column("l_orderkey")))
    t = pa.table(
        {
            "key": batch.column("l_orderkey").cast(pa.int64()),
            "qty": batch.column("l_quantity").cast(pa.int64()),
        }
    )
    g = t.group_by(["key"]).aggregate([("qty", "sum")])
    return pa.table({"key": g.column("key"), "qty": g.column("qty_sum")})


def _q18_orders_side(batch: pa.Table, big_ref) -> pa.Table:
    """Orders semi-filtered to the big-order set; carries the order's
    qty from the broadcast lookup (sorted arrays + searchsorted).
    Null keys are dropped BEFORE the numpy view (a NaN-degraded float64
    array rounds keys >2^53 — the same hazard the bloom probe guards)."""
    keys, qtys = ray.get(big_ref) if isinstance(big_ref, ray.ObjectRef) else big_ref
    batch = batch.filter(
        pc.and_(pc.is_valid(batch.column("o_orderkey")), pc.is_valid(batch.column("o_custkey")))
    )
    ok = np.asarray(batch.column("o_orderkey").cast(pa.int64()).combine_chunks())
    idx = np.searchsorted(keys, ok)
    hit = (idx < len(keys)) & (keys[np.minimum(idx, max(len(keys) - 1, 0))] == ok) if len(keys) else np.zeros(len(ok), bool)
    batch = batch.filter(pa.array(hit))
    n = batch.num_rows
    ok = np.asarray(batch.column("o_orderkey").cast(pa.int64()).combine_chunks()) if n else np.array([], np.int64)
    qty = qtys[np.searchsorted(keys, ok)] if n else np.array([], np.int64)
    from ..functions.money import floored_cents

    return pa.table(
        {
            "key": batch.column("o_custkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "c_name": pa.nulls(n, pa.string()),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "price_cents": floored_cents(batch.column("o_totalprice")) if n else pa.array([], pa.int64()),
            "total_qty": pa.array(qty),
        }
    )


def _q18_cust_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("c_custkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_name": batch.column("c_name"),
            "o_orderkey": pa.nulls(n, pa.int64()),
            "price_cents": pa.nulls(n, pa.int64()),
            "total_qty": pa.nulls(n, pa.int64()),
        }
    )


def _q18_join_block(block: pa.Table) -> pa.Table:
    """Per custkey run (unique build key = the customer): emit each
    big-order probe row labeled with the customer's name."""
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "o_orderkey": pa.array([], pa.int64()),
            "price_cents": pa.array([], pa.int64()),
            "total_qty": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    names = block.column("c_name").take(pa.array(build_idx[keep].astype(np.int64)))
    kept = block.filter(pa.array(keep))
    return pa.table(
        {
            "c_custkey": kept.column("key"),
            "c_name": names,
            "o_orderkey": kept.column("o_orderkey"),
            "price_cents": kept.column("price_cents"),
            "total_qty": kept.column("total_qty"),
        }
    )


def large_volume_customers(sf_dir: str, n_top: int = Q18_TOP) -> ray.data.Dataset:
    """Large-volume customers (the TPC-H Q18 shape): orders whose total
    lineitem quantity clears a HAVING threshold, labeled with their
    customer — the HAVING-over-join pattern.  The per-order quantity
    aggregate runs as combiner partials + one groupby; the surviving
    "big" set (bounded by the HAVING selectivity — documented broadcast
    assumption) ships as sorted arrays via ``ray.put`` and semi-filters
    the orders scan; ONE sort exchange then attaches customer names."""
    from ray.data.aggregate import Sum

    from ..functions.debug import null_safe_groupby_agg

    sf = sf_dir.rstrip("/")
    per_order = null_safe_groupby_agg(
        read_parquet_clean(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
        .map_batches(_q18_qty_partials, batch_format="pyarrow"),
        "key",
        Sum("qty", alias_name="qty"),
        out_types={"qty": pa.int64()},
    )
    big = per_order.map_batches(
        lambda b: b.filter(pc.greater(b.column("qty"), Q18_QTY)),
        batch_format="pyarrow",
    ).take_all()
    keys = np.array([r["key"] for r in big], dtype=np.int64)
    order = np.argsort(keys)
    keys = keys[order]
    qtys = np.array([r["qty"] for r in big], dtype=np.int64)[order]
    big_ref = ray.put((keys, qtys))

    orders = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(_q18_orders_side, batch_format="pyarrow", fn_kwargs={"big_ref": big_ref})
    cust = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_q18_cust_side, batch_format="pyarrow")
    joined = checked_sort(cust.union(orders), "key").map_batches(
        _q18_join_block, batch_format="pyarrow", batch_size=None
    )
    out = joined.sort(["price_cents", "o_orderkey"], descending=[True, False]).limit(n_top)
    from ..functions.blocks import compact_small_result

    return compact_small_result(
        out,
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("o_orderkey", pa.int64()),
                ("price_cents", pa.int64()),
                ("total_qty", pa.int64()),
            ]
        ),
    )
