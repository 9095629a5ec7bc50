"""Correlated-subquery and multi-predicate join shapes (TPC-H Q17 /
Q21 / Q22 / Q7 / Q14 analogues), decorrelated Ray-Data-first.

The reference (swiftj/nifi-processors) has no relational engine
(SURVEY §2.4); these are the lakehouse-side analytic patterns a CDC-fed
warehouse runs that the rest of ``ops/`` does not yet cover:

- :func:`small_qty_part_revenue` (Q17) — a CORRELATED SCALAR SUBQUERY
  (each row compared against its own group's average) evaluated with no
  second fact pass: one sort exchange on the correlation key co-locates
  each part's whole lineitem group, and the per-run kernel computes the
  aggregate AND applies the row-level predicate in the same block.  The
  ``qty < avg(qty)/5`` comparison is cross-multiplied to integers
  (``5·qty·cnt < sum``) so the twin can never drift on float division.
- :func:`sole_returned_supplier` (Q21) — EXISTS and NOT-EXISTS against
  the SAME table resolved in ONE co-located pass: per order-run, the
  distinct-supplier and distinct-returned-supplier counts decide both
  quantifiers at once (multi-supplier order, exactly one supplier with
  a returned item).  All run logic is reduceat-vectorized.
- :func:`idle_rich_customers` (Q22) — a GLOBAL scalar subquery (the
  positive-balance average) reduced to two int64 scalars on the driver
  and applied as a cross-multiplied predicate inside the scan, then the
  engine's anti-join exchange and a per-nation rollup.
- :func:`nation_pair_volume` (Q7) — the two-sided dimension tagging
  chain: supplier-nation and customer-nation ride separate exchanges
  and meet on the orderkey, where the asymmetric pair predicate
  (``s_nat != c_nat``) is applied block-locally.
- :func:`promo_revenue_share` (Q14) — conditional aggregation over a
  fact-to-dim join: one exchange, per-run CASE-WHEN partials, two
  integer sums out.

Scale posture: every fact leg is ONE co-partitioned sort exchange with
per-batch combiners; tiny dims (nation) are driver-read; the Q21/Q22
count tables that re-shuffle are bounded by |suppliers| / |nations|;
bloom semijoin reduction (``functions/bloom.py``) prunes probe scans
where a prior hop has already shrunk the key set — false positives are
dropped by the exact build-side check, so the filter can never change
a result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.blocks import compact_small_result, sorted_build_probe_runs
from ..functions.bloom import bloom_member, build_key_bloom
from ..functions.debug import checked_sort, null_safe_groupby_agg, null_safe_sort
from ..functions.money import discounted_floored_cents, floored_cents
from ..sources.reader import read_parquet_exchange as read_parquet_clean

# ---------------------------------------------------------------------------
# Q17 shape: small-quantity part revenue (correlated scalar subquery)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#23"

SMALL_QTY_PART_REVENUE_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT COUNT(l2.l_quantity) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
      < (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
         FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def _q17_part_side(batch: pa.Table) -> pa.Table:
    """Build side: DISTINCT keys of brand parts (predicate pushed into
    the scan; p_partkey is a pk — dedup keeps the contract explicit)."""
    keys = pc.unique(batch.column("p_partkey").cast(pa.int64()).combine_chunks())
    keys = keys.filter(pc.is_valid(keys))
    m = len(keys)
    return pa.table(
        {
            "key": keys,
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            "qty": pa.nulls(m, pa.int64()),
            "cents": pa.nulls(m, pa.int64()),
        }
    )


def _q17_lineitem_side(batch: pa.Table, bloom_ref=None) -> pa.Table:
    """Probe side: RAW rows (qty, price cents) — the correlated
    predicate needs every row against its group aggregate, so no
    per-batch pre-aggregation is possible; the bloom prunes the scan to
    ~|brand parts| / |parts| of the fact instead."""
    key_col = batch.column("l_partkey").cast(pa.int64()).combine_chunks()
    valid = np.asarray(pc.is_valid(key_col))
    if bloom_ref is not None:
        bloom = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        keys = np.asarray(pc.fill_null(key_col, 0))
        valid &= bloom_member(keys, bloom)
    batch = batch.filter(pa.array(valid))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("l_partkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "qty": batch.column("l_quantity").cast(pa.int64()),
            "cents": floored_cents(batch.column("l_extendedprice")),
        }
    )


def _q17_block(block: pa.Table) -> pa.Table:
    """Per partkey run (co-located whole by the checked sort): compute
    the group's (sum_qty, cnt) over non-null quantities, then keep rows
    with ``5·qty·cnt < sum_qty`` — the integer-exact form of
    ``qty < 0.2 · avg(qty)``.  Null-qty rows are invisible on both
    sides of the inequality, exactly like the twin (COUNT(l_quantity)
    skips them; NULL < x excludes the row)."""
    empty = pa.table(
        {
            "n_small": pa.array([], pa.int64()),
            "cents_sum": pa.array([], pa.int64()),
            "n_valid": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    qty_col = block.column("qty").combine_chunks()
    qty_valid = np.asarray(pc.is_valid(qty_col))
    qty = np.asarray(pc.fill_null(qty_col, 0))
    probe = side == 1
    counted = probe & qty_valid
    run_id = np.repeat(np.arange(len(starts)), run_len)
    n_runs = len(starts)
    sum_qty = np.zeros(n_runs, dtype=np.int64)
    np.add.at(sum_qty, run_id, np.where(counted, qty, 0))
    cnt = np.zeros(n_runs, dtype=np.int64)
    np.add.at(cnt, run_id, counted.astype(np.int64))
    keep = counted & (build_idx >= 0) & (5 * qty * cnt[run_id] < sum_qty[run_id])
    if not keep.any():
        return empty
    cents = block.column("cents").filter(pa.array(keep))
    return pa.table(
        {
            "n_small": pa.array([int(keep.sum())], pa.int64()),
            "cents_sum": pa.array([int(pc.sum(cents).as_py() or 0)], pa.int64()),
            "n_valid": pa.array([len(cents) - cents.null_count], pa.int64()),
        }
    )


def small_qty_part_revenue(sf_dir: str, *, use_bloom: bool = True) -> pa.Table:
    """Revenue from small-quantity orders of one brand's parts (the
    TPC-H Q17 shape): each lineitem is compared against the average
    quantity of ITS OWN part — a correlated scalar subquery.

    Decorrelation: ONE sort exchange on ``l_partkey`` co-locates every
    part's whole lineitem group with the brand-part build row; the
    per-run kernel computes the group aggregate and applies the
    row-level predicate in the same pass — no second fact scan, no
    stats broadcast.  A bloom of brand-part keys prunes the lineitem
    scan before the exchange (exact build check drops false positives).
    """
    sf = sf_dir.rstrip("/")
    parts = read_parquet_clean(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_brand"],
        filter=pc.field("p_brand") == Q17_BRAND,
    ).map_batches(_q17_part_side, batch_format="pyarrow").materialize()
    bloom_ref = build_key_bloom(parts, "key") if use_bloom else None
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(
        _q17_lineitem_side, batch_format="pyarrow", fn_kwargs={"bloom_ref": bloom_ref}
    )
    partials = checked_sort(parts.union(items), "key").map_batches(
        _q17_block, batch_format="pyarrow", batch_size=None
    )
    rows = partials.take_all()
    n = sum(r["n_small"] for r in rows)
    n_valid = sum(r["n_valid"] for r in rows)
    # SQL SUM over zero non-null addends is NULL, not 0
    cents = sum(r["cents_sum"] for r in rows) if n_valid else None
    return pa.table(
        {"n_small": pa.array([n], pa.int64()), "revenue_cents": pa.array([cents], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Q21 shape: the sole returned-item supplier of multi-supplier orders
# ---------------------------------------------------------------------------

Q21_STATUS = "F"
Q21_TOP = 10

SOLE_RETURNED_SUPPLIER_SQL = f"""
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R' AND l_suppkey IS NOT NULL) l1
JOIN orders o  ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE o.o_orderstatus = '{Q21_STATUS}'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_name, s.s_suppkey
LIMIT {Q21_TOP}
"""


def _q21_orders_side(batch: pa.Table) -> pa.Table:
    """Build side: keys of F-status orders (predicate pushed into the
    scan)."""
    keys = pc.unique(batch.column("o_orderkey").cast(pa.int64()).combine_chunks())
    keys = keys.filter(pc.is_valid(keys))
    m = len(keys)
    return pa.table(
        {
            "key": keys,
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            "supp": pa.nulls(m, pa.int64()),
            "ret": pa.nulls(m, pa.bool_()),
        }
    )


def _q21_lineitem_side(batch: pa.Table) -> pa.Table:
    """Probe side combined per (orderkey, suppkey) in the batch: one row
    per pair with ``ret = any returned``.  Null-supplier rows are
    invisible to every quantifier in the twin (``<>`` never matches
    NULL, and l1 requires a supplier) — dropped here for the same
    semantics."""
    batch = batch.filter(
        pc.and_(
            pc.is_valid(batch.column("l_orderkey")),
            pc.is_valid(batch.column("l_suppkey")),
        )
    )
    t = pa.table(
        {
            "key": batch.column("l_orderkey").cast(pa.int64()),
            "supp": batch.column("l_suppkey").cast(pa.int64()),
            "ret": pc.equal(batch.column("l_returnflag"), "R"),
        }
    )
    g = t.group_by(["key", "supp"]).aggregate([("ret", "max")])
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "supp": g.column("supp"),
            "ret": pc.fill_null(g.column("ret_max"), False),
        }
    )


def _q21_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: both quantifiers at once.  Pair partials from
    different batches are re-merged (``ret = any``), then the order
    qualifies iff it has an F-status build row, ≥2 distinct suppliers,
    and EXACTLY ONE supplier with a returned item — that supplier gets
    the win.  All reduceat-vectorized, no per-run Python."""
    empty = pa.table({"supp": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    if block.num_rows == 0:
        return empty
    # sort by (key, side, supp): build rows first, then probe pairs by supplier
    block = block.sort_by(
        [("key", "ascending"), ("side", "ascending"), ("supp", "ascending")]
    )
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    probe = side == 1
    build_keys = np.unique(key[~probe])
    k = key[probe]
    if len(k) == 0:
        return empty
    s = np.asarray(pc.fill_null(block.column("supp"), -1).combine_chunks())[probe]
    r = np.asarray(pc.fill_null(block.column("ret"), False).combine_chunks())[probe]
    # pair runs (same key, same supplier — partials from different batches)
    new_pair = np.concatenate([[True], (k[1:] != k[:-1]) | (s[1:] != s[:-1])])
    pstarts = np.nonzero(new_pair)[0]
    pair_key = k[pstarts]
    pair_supp = s[pstarts]
    pair_ret = np.logical_or.reduceat(r, pstarts)
    # key runs over the pair table
    new_key = np.concatenate([[True], pair_key[1:] != pair_key[:-1]])
    kstarts = np.nonzero(new_key)[0]
    n_pairs = np.diff(np.concatenate([kstarts, [len(pair_key)]]))
    n_ret = np.add.reduceat(pair_ret.astype(np.int64), kstarts)
    # the single returned supplier (valid only where n_ret == 1); the
    # absent-sentinel must sort below ANY real key, not just positive
    # ones — int64 min, never -1
    lone = np.maximum.reduceat(
        np.where(pair_ret, pair_supp, np.iinfo(np.int64).min), kstarts
    )
    uk = pair_key[kstarts]
    idx = np.searchsorted(build_keys, uk)
    has_build = (
        (idx < len(build_keys)) & (build_keys[np.minimum(idx, max(len(build_keys) - 1, 0))] == uk)
        if len(build_keys)
        else np.zeros(len(uk), dtype=bool)
    )
    win = has_build & (n_pairs >= 2) & (n_ret == 1)
    if not win.any():
        return empty
    supp_win = lone[win]
    order = np.argsort(supp_win, kind="stable")
    sw = supp_win[order]
    rstart = np.concatenate([[True], sw[1:] != sw[:-1]])
    ridx = np.nonzero(rstart)[0]
    counts = np.diff(np.concatenate([ridx, [len(sw)]]))
    return pa.table(
        {
            "supp": pa.array(sw[ridx].astype(np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def _q21_supp_name_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("s_suppkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "s_name": batch.column("s_name"),
            "n": pa.nulls(n, pa.int64()),
        }
    )


def _q21_count_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("supp"),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "s_name": pa.nulls(n, pa.string()),
            "n": batch.column("n"),
        }
    )


def _q21_name_block(block: pa.Table) -> pa.Table:
    """Per suppkey run (unique build key = the supplier): label count
    rows with the supplier's name (inner join)."""
    empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "numwait": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    names = block.column("s_name").take(pa.array(build_idx[keep].astype(np.int64)))
    kept = block.filter(pa.array(keep))
    return pa.table(
        {"s_suppkey": kept.column("key"), "s_name": names, "numwait": kept.column("n")}
    )


def sole_returned_supplier(sf_dir: str, n_top: int = Q21_TOP) -> ray.data.Dataset:
    """Suppliers who were the ONLY supplier with a returned item in a
    finished multi-supplier order (the TPC-H Q21 quantifier shape):
    EXISTS (another supplier in the order) and NOT EXISTS (another
    supplier with a returned item) resolved in ONE co-located pass per
    orderkey run — the distinct-supplier and returned-supplier counts
    decide both quantifiers together.  The per-supplier win counts
    (≤ |supplier| rows) then take one exchange to pick up names."""
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"],
        filter=pc.field("o_orderstatus") == Q21_STATUS,
    ).map_batches(_q21_orders_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    ).map_batches(_q21_lineitem_side, batch_format="pyarrow")
    wins = checked_sort(orders.union(items), "key").map_batches(
        _q21_block, batch_format="pyarrow", batch_size=None
    )
    counts = null_safe_groupby_agg(
        wins, "supp", Sum("n", alias_name="n"), out_types={"n": pa.int64()}
    )
    supp = read_parquet_clean(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_q21_supp_name_side, batch_format="pyarrow")
    probe = counts.map_batches(_q21_count_side, batch_format="pyarrow")
    named = checked_sort(supp.union(probe), "key").map_batches(
        _q21_name_block, batch_format="pyarrow", batch_size=None
    )
    # null-safe AND NULLS-LAST: null_safe_sort's min-sentinel would place
    # a null name FIRST among ascending ties where DuckDB orders NULLS
    # LAST.  No string sentinel can sort after EVERY possible name (an
    # astral-plane char sorts past U+FFFF in UTF-8 order), so the null
    # placement is its own integer key: is_null ascending BEFORE the name
    # puts null names last among ties, exactly DuckDB's default —
    # collision-free by construction.
    def _name_null_flag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__name_null", pc.is_null(b.column("s_name")).cast(pa.int8())
        )

    out = (
        null_safe_sort(
            named.map_batches(_name_null_flag, batch_format="pyarrow"),
            ["numwait", "__name_null", "s_name", "s_suppkey"],
            descending=[True, False, False, False],
        )
        .limit(n_top)
        .map_batches(
            lambda b: b.drop_columns(["__name_null"]), batch_format="pyarrow"
        )
    )
    return compact_small_result(
        out,
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("numwait", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q22 shape: idle rich customers (global scalar subquery + anti-join)
# ---------------------------------------------------------------------------

Q22_CUTOFF = "1999-01-01"

IDLE_RICH_CUSTOMERS_SQL = f"""
WITH pos AS (
  SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer c, pos
WHERE CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


def _q22_pos_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the global scalar: (Σ floored cents, count)
    over positive balances."""
    batch = batch.filter(pc.greater(batch.column("c_acctbal"), 0.0))
    cents = floored_cents(batch.column("c_acctbal"))
    return pa.table(
        {
            "s": pa.array([int(pc.sum(cents).as_py() or 0)], pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64()),
        }
    )


def _q22_cust_side(batch: pa.Table, s: int, n: int) -> pa.Table:
    """Build side: customers whose balance clears the cross-multiplied
    global-average threshold (``cents·n > s`` ⇔ ``bal > avg``; a NULL
    balance fails the comparison, like the twin)."""
    cents = floored_cents(batch.column("c_acctbal"))
    batch = batch.append_column("__cents", cents)
    batch = batch.filter(pc.greater(pc.multiply(cents, np.int64(n)), np.int64(s)))
    m = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            "c_nat": batch.column("c_nationkey").cast(pa.int64()),
            "cents": batch.column("__cents"),
        }
    )


def _q22_order_keys(batch: pa.Table) -> pa.Table:
    """Probe side: per-batch DISTINCT custkeys of RECENT orders (the
    cutoff predicate is pushed into the scan).  Null custkeys can never
    satisfy the EXISTS — dropped (a null-key order must not
    anti-eliminate the null-key customers' run)."""
    keys = pc.unique(batch.column("o_custkey").cast(pa.int64()).combine_chunks())
    keys = keys.filter(pc.is_valid(keys))
    m = len(keys)
    return pa.table(
        {
            "key": keys,
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "c_nat": pa.nulls(m, pa.int64()),
            "cents": pa.nulls(m, pa.int64()),
        }
    )


def _q22_anti_block(block: pa.Table) -> pa.Table:
    """Per custkey run: keep BUILD rows whose run has no probe row
    (NOT EXISTS), reduced to per-nation partials before the exchange."""
    empty = pa.table(
        {
            "c_nat": pa.array([], pa.int64()),
            "n_cust": pa.array([], pa.int64()),
            "bal_cents": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(pc.fill_null(block.column("key").combine_chunks(), np.iinfo(np.int64).min))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    run_id = np.cumsum(new_run) - 1
    has_probe = np.zeros(run_id[-1] + 1, dtype=bool)
    np.logical_or.at(has_probe, run_id, side == 1)
    keep = (side == 0) & ~has_probe[run_id]
    if not keep.any():
        return empty
    kept = block.filter(pa.array(keep))
    t = pa.table({"c_nat": kept.column("c_nat"), "cents": kept.column("cents")})
    g = t.group_by(["c_nat"]).aggregate([("cents", "sum"), ([], "count_all")])
    return pa.table(
        {
            "c_nat": g.column("c_nat"),
            "n_cust": g.column("count_all").cast(pa.int64()),
            "bal_cents": g.column("cents_sum"),
        }
    )


def idle_rich_customers(sf_dir: str) -> ray.data.Dataset:
    """Per-nation count and balance of customers ABOVE the global
    positive-balance average with NO order since the cutoff (the TPC-H
    Q22 shape).  The global scalar reduces to two int64s on the driver
    (legal: two numbers, not data) and is applied as an integer
    cross-multiplied predicate inside the customer scan; the NOT EXISTS
    is the engine's co-partitioned anti-join exchange with per-batch
    distinct-key combining on the orders side."""
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    pos = (
        read_parquet_clean(f"{sf}/customer.parquet", columns=["c_acctbal"])
        .map_batches(_q22_pos_partials, batch_format="pyarrow")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    s, n = int(pos["s"] or 0), int(pos["n"] or 0)

    cust = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(_q22_cust_side, batch_format="pyarrow", fn_kwargs={"s": s, "n": n})
    cutoff = pa.scalar(np.datetime64(Q22_CUTOFF, "us"), pa.timestamp("us"))
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= cutoff,
    ).map_batches(_q22_order_keys, batch_format="pyarrow")
    partials = checked_sort(cust.union(orders), "key").map_batches(
        _q22_anti_block, batch_format="pyarrow", batch_size=None
    )
    agg = null_safe_groupby_agg(
        partials,
        "c_nat",
        Sum("n_cust", alias_name="n_cust"),
        Sum("bal_cents", alias_name="bal_cents"),
        out_types={"n_cust": pa.int64(), "bal_cents": pa.int64()},
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": b.column("c_nat"),
                "n_cust": b.column("n_cust"),
                "bal_cents": b.column("bal_cents"),
            }
        )

    # null-safe: a NULL c_nationkey group survives the rollup (SQL
    # GROUP BY keeps it) and would TypeError in a raw sort's boundary
    # sample
    out = null_safe_sort(agg.map_batches(rename, batch_format="pyarrow"), "c_nationkey")
    return compact_small_result(
        out,
        pa.schema(
            [
                ("c_nationkey", pa.int64()),
                ("n_cust", pa.int64()),
                ("bal_cents", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipped between a nation pair
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_LO = "1995-01-01"
Q7_HI = "1997-01-01"

NATION_PAIR_VOLUME_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
WHERE ((ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
    OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '{Q7_LO}'
  AND l.l_shipdate <  TIMESTAMP '{Q7_HI}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def _pair_nation_keys(sf_dir: str) -> tuple[list[int], pa.Table]:
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    pair = nation.filter(
        pc.is_in(
            nation.column("n_name"), value_set=pa.array([Q7_NATION_A, Q7_NATION_B])
        )
    )
    # null keys can never join; in an index_in value_set they'd match
    # null probe keys (SQL NULL equality never does)
    pair = pair.filter(pc.is_valid(pair.column("n_nationkey")))
    keys = pair.column("n_nationkey").cast(pa.int64())
    names = pa.table({"n_nationkey": keys, "n_name": pair.column("n_name")})
    return keys.to_pylist(), names


def _q7_cust_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("c_custkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_nat": batch.column("c_nationkey").cast(pa.int64()),
            "o_orderkey": pa.nulls(n, pa.int64()),
        }
    )


def _q7_orders_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(
        pc.and_(
            pc.is_valid(batch.column("o_custkey")),
            pc.is_valid(batch.column("o_orderkey")),
        )
    )
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_custkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "c_nat": pa.nulls(n, pa.int64()),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
        }
    )


def _q7_hop1_block(block: pa.Table) -> pa.Table:
    """Per custkey run: tag the customer's orders with c_nat."""
    empty = pa.table(
        {"o_orderkey": pa.array([], pa.int64()), "c_nat": pa.array([], pa.int64())}
    )
    if block.num_rows == 0:
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


def _q7_supp_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("s_suppkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "s_nat": batch.column("s_nationkey").cast(pa.int64()),
            "orderkey": pa.nulls(n, pa.int64()),
            "year": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q7_lineitem_side(batch: pa.Table, bloom_ref=None) -> pa.Table:
    """Probe side pre-aggregated per (suppkey, orderkey, year) in the
    batch (shipdate window pushed into the scan; the bloom drops
    lineitems whose order has no pair-nation customer BEFORE this
    exchange)."""
    key_col = batch.column("l_orderkey").cast(pa.int64()).combine_chunks()
    valid = np.asarray(pc.is_valid(key_col)) & np.asarray(
        pc.is_valid(batch.column("l_suppkey").combine_chunks())
    )
    if bloom_ref is not None:
        bloom = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        keys = np.asarray(pc.fill_null(key_col, 0))
        valid &= bloom_member(keys, bloom)
    batch = batch.filter(pa.array(valid))
    ship = np.asarray(
        batch.column("l_shipdate").cast(pa.timestamp("us")).combine_chunks()
    ).astype("datetime64[Y]").astype(np.int64) + 1970
    t = pa.table(
        {
            "key": batch.column("l_suppkey").cast(pa.int64()),
            "orderkey": batch.column("l_orderkey").cast(pa.int64()),
            "year": pa.array(ship, pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )
    g = t.group_by(["key", "orderkey", "year"]).aggregate([("cents", "sum")])
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "s_nat": pa.nulls(m, pa.int64()),
            "orderkey": g.column("orderkey"),
            "year": g.column("year"),
            "cents": g.column("cents_sum"),
        }
    )


def _q7_hop2_block(block: pa.Table) -> pa.Table:
    """Per suppkey run: tag lineitem partials with s_nat."""
    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "s_nat": pa.array([], pa.int64()),
            "c_nat": pa.array([], pa.int64()),
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
    s_nat = np.asarray(pc.fill_null(block.column("s_nat"), -1).combine_chunks())
    m = int(keep.sum())
    return pa.table(
        {
            "key": block.column("orderkey").filter(pa.array(keep)),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "s_nat": pa.array(s_nat[build_idx[keep]]),
            "c_nat": pa.nulls(m, pa.int64()),
            "year": block.column("year").filter(pa.array(keep)),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )


def _q7_order_build_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey"),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "s_nat": pa.nulls(n, pa.int64()),
            "c_nat": batch.column("c_nat"),
            "year": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q7_hop3_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: apply the asymmetric pair predicate
    (``s_nat != c_nat``; both sides are in-pair by construction) and
    reduce to per (s_nat, c_nat, year) partials."""
    empty = pa.table(
        {
            "s_nat": pa.array([], pa.int64()),
            "c_nat": pa.array([], pa.int64()),
            "l_year": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    c_nat = np.asarray(pc.fill_null(block.column("c_nat"), -2).combine_chunks())
    s_nat = np.asarray(pc.fill_null(block.column("s_nat"), -1).combine_chunks())
    keep = (side == 1) & (build_idx >= 0)
    keep &= s_nat != c_nat[np.maximum(build_idx, 0)]
    if not keep.any():
        return empty
    t = pa.table(
        {
            "s_nat": pa.array(s_nat[keep]),
            "c_nat": pa.array(c_nat[np.maximum(build_idx, 0)][keep]),
            "l_year": block.column("year").filter(pa.array(keep)),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )
    g = t.group_by(["s_nat", "c_nat", "l_year"]).aggregate([("cents", "sum")])
    return pa.table(
        {
            "s_nat": g.column("s_nat"),
            "c_nat": g.column("c_nat"),
            "l_year": g.column("l_year"),
            "cents": g.column("cents_sum"),
        }
    )


def nation_pair_volume(sf_dir: str, *, use_bloom: bool = True) -> ray.data.Dataset:
    """Revenue shipped between two nations per (direction, year) — the
    TPC-H Q7 shape.  Supplier nation and customer nation ride SEPARATE
    exchanges (suppkey for lineitem tagging, custkey for order tagging)
    and meet on the orderkey, where the asymmetric pair predicate
    ``s_nat != c_nat`` is applied block-locally.  A bloom of the
    pair-customers' order keys prunes the lineitem scan (≈ 2/|nations|
    selectivity) before its first exchange."""
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    nat_keys, names = _pair_nation_keys(sf)
    lo = pa.scalar(np.datetime64(Q7_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q7_HI, "us"), pa.timestamp("us"))

    cust = read_parquet_clean(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(nat_keys),
    ).map_batches(_q7_cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(_q7_orders_side, batch_format="pyarrow")
    tagged_orders = checked_sort(cust.union(orders), "key").map_batches(
        _q7_hop1_block, batch_format="pyarrow", batch_size=None
    ).materialize()  # consumed twice: bloom build + hop-3 build side

    bloom_ref = build_key_bloom(tagged_orders, "o_orderkey") if use_bloom else None
    supp = read_parquet_clean(
        f"{sf}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(nat_keys),
    ).map_batches(_q7_supp_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(
        _q7_lineitem_side, batch_format="pyarrow", fn_kwargs={"bloom_ref": bloom_ref}
    )
    tagged_items = checked_sort(supp.union(items), "key").map_batches(
        _q7_hop2_block, batch_format="pyarrow", batch_size=None
    )

    build3 = tagged_orders.map_batches(_q7_order_build_side, batch_format="pyarrow")
    partials = checked_sort(build3.union(tagged_items), "key").map_batches(
        _q7_hop3_block, batch_format="pyarrow", batch_size=None
    )
    agg = partials.groupby(["s_nat", "c_nat", "l_year"]).aggregate(
        Sum("cents", alias_name="revenue_cents")
    )
    names_ref = ray.put(names)

    def label(b: pa.Table) -> pa.Table:
        nm = ray.get(names_ref) if isinstance(names_ref, ray.ObjectRef) else names_ref
        si = pc.index_in(b.column("s_nat"), value_set=nm.column("n_nationkey"))
        ci = pc.index_in(b.column("c_nat"), value_set=nm.column("n_nationkey"))
        return pa.table(
            {
                "supp_nation": nm.column("n_name").take(si),
                "cust_nation": nm.column("n_name").take(ci),
                "l_year": b.column("l_year"),
                "revenue_cents": b.column("revenue_cents"),
            }
        )

    out = agg.map_batches(label, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )
    return compact_small_result(
        out,
        pa.schema(
            [
                ("supp_nation", pa.string()),
                ("cust_nation", pa.string()),
                ("l_year", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share (conditional aggregation over a join)
# ---------------------------------------------------------------------------

Q14_TYPE = "PROMO"
Q14_LO = "1996-01-01"
Q14_HI = "1996-04-01"

PROMO_REVENUE_SHARE_SQL = f"""
SELECT CAST(SUM(CASE WHEN p.p_type = '{Q14_TYPE}'
                     THEN CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS total_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
  AND l.l_shipdate <  TIMESTAMP '{Q14_HI}'
"""


def _q14_part_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("p_partkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("p_partkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "promo": pc.equal(batch.column("p_type"), Q14_TYPE),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q14_lineitem_side(batch: pa.Table) -> pa.Table:
    """Probe side pre-aggregated per partkey in the batch (shipdate
    window pushed into the scan)."""
    batch = batch.filter(pc.is_valid(batch.column("l_partkey")))
    t = pa.table(
        {
            "key": batch.column("l_partkey").cast(pa.int64()),
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
            "promo": pa.nulls(m, pa.bool_()),
            "cents": g.column("cents_sum"),
        }
    )


def _q14_block(block: pa.Table) -> pa.Table:
    """Per partkey run (unique build key): CASE-WHEN partials — the
    probe partials' cents go to ``total`` always and to ``promo`` iff
    the build row's part type matches."""
    empty = pa.table(
        {
            "promo_cents": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
            "n_promo_addends": pa.array([], pa.int64()),
            "n_valid": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    promo = np.asarray(
        pc.fill_null(block.column("promo"), False).combine_chunks()
    )
    cents_col = block.column("cents").combine_chunks()
    cents_valid = np.asarray(pc.is_valid(cents_col))
    cents = np.asarray(pc.fill_null(cents_col, 0))
    kept_cents = cents[keep]
    kept_promo = promo[build_idx[keep]]
    kept_valid = cents_valid[keep]
    # a promo addend is non-NULL iff the row is non-promo (the ELSE 0)
    # or its cents are valid; a total addend needs valid cents
    return pa.table(
        {
            "promo_cents": pa.array([int(kept_cents[kept_promo].sum())], pa.int64()),
            "total_cents": pa.array([int(kept_cents.sum())], pa.int64()),
            "n_promo_addends": pa.array([int((~kept_promo | kept_valid).sum())], pa.int64()),
            "n_valid": pa.array([int(kept_valid.sum())], pa.int64()),
        }
    )


def promo_revenue_share(sf_dir: str) -> pa.Table:
    """Promo vs total revenue in one quarter (the TPC-H Q14 shape):
    conditional aggregation over the lineitem ⋈ part join — one
    co-partitioned sort exchange, per-run CASE-WHEN partials, two int64
    sums out (the caller derives the share; a ratio would not be
    IEEE-stable across summation orders)."""
    sf = sf_dir.rstrip("/")
    lo = pa.scalar(np.datetime64(Q14_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q14_HI, "us"), pa.timestamp("us"))
    parts = read_parquet_clean(
        f"{sf}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(_q14_part_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(_q14_lineitem_side, batch_format="pyarrow")
    partials = checked_sort(parts.union(items), "key").map_batches(
        _q14_block, batch_format="pyarrow", batch_size=None
    )
    rows = partials.take_all()
    n_promo_addends = sum(r["n_promo_addends"] for r in rows)
    n_valid = sum(r["n_valid"] for r in rows)
    # SQL SUM semantics: NULL over zero joined rows; the CASE's ELSE 0
    # makes promo non-null whenever ANY row joins, while total needs a
    # non-null addend
    promo = sum(r["promo_cents"] for r in rows) if n_promo_addends else None
    total = sum(r["total_cents"] for r in rows) if n_valid else None
    return pa.table(
        {
            "promo_cents": pa.array([promo], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive predicates spanning both join sides
# ---------------------------------------------------------------------------

#: (brand, size_lo, size_hi, qty_lo, qty_hi) — each disjunct constrains
#: BOTH sides of the join, so no single-side pushdown can evaluate it
Q19_BANDS = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#34", 1, 35, 20, 30),
)

_Q19_PRED_SQL = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
    f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_BANDS
)

DISJUNCTIVE_BAND_REVENUE_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_Q19_PRED_SQL}
"""


def _q19_part_side(batch: pa.Table) -> pa.Table:
    """Build side: parts of any disjunct's brand (IN-set pushed into
    the scan), carrying the band code and size the kernel needs."""
    batch = batch.filter(pc.is_valid(batch.column("p_partkey")))
    code = pc.index_in(
        batch.column("p_brand"), value_set=pa.array([b[0] for b in Q19_BANDS])
    )
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("p_partkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "band": code.cast(pa.int64()),
            "size": batch.column("p_size").cast(pa.int64()),
            "qty": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q19_lineitem_side(batch: pa.Table, bloom_ref=None) -> pa.Table:
    """Probe side: RAW rows — the disjunction needs (band, size) from
    the build AND (qty) from the probe, so it can only be evaluated at
    the join; the bloom prunes the scan to ~|brand parts|/|parts|."""
    key_col = batch.column("l_partkey").cast(pa.int64()).combine_chunks()
    valid = np.asarray(pc.is_valid(key_col))
    if bloom_ref is not None:
        bloom = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        keys = np.asarray(pc.fill_null(key_col, 0))
        valid &= bloom_member(keys, bloom)
    batch = batch.filter(pa.array(valid))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("l_partkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "band": pa.nulls(n, pa.int64()),
            "size": pa.nulls(n, pa.int64()),
            "qty": batch.column("l_quantity").cast(pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )


def _q19_block(block: pa.Table) -> pa.Table:
    """Per partkey run: evaluate the full disjunction vectorized — the
    build row contributes (band, size), each probe row its quantity; a
    NULL on either side fails every disjunct, like SQL BETWEEN."""
    empty = pa.table(
        {
            "n_items": pa.array([], pa.int64()),
            "cents_sum": pa.array([], pa.int64()),
            "n_valid": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    joined = (side == 1) & (build_idx >= 0)
    if not joined.any():
        return empty
    bi = np.maximum(build_idx, 0)
    band = np.asarray(pc.fill_null(block.column("band"), -1).combine_chunks())[bi]
    size_col = block.column("size").combine_chunks()
    size_ok = np.asarray(pc.is_valid(size_col))[bi]
    size = np.asarray(pc.fill_null(size_col, 0))[bi]
    qty_col = block.column("qty").combine_chunks()
    qty_ok = np.asarray(pc.is_valid(qty_col))
    qty = np.asarray(pc.fill_null(qty_col, 0))
    keep = np.zeros(len(band), dtype=bool)
    for i, (_, slo, shi, qlo, qhi) in enumerate(Q19_BANDS):
        keep |= (band == i) & (size >= slo) & (size <= shi) & (qty >= qlo) & (qty <= qhi)
    keep &= joined & size_ok & qty_ok
    if not keep.any():
        return empty
    cents = block.column("cents").filter(pa.array(keep))
    return pa.table(
        {
            "n_items": pa.array([int(keep.sum())], pa.int64()),
            "cents_sum": pa.array([int(pc.sum(cents).as_py() or 0)], pa.int64()),
            "n_valid": pa.array([len(cents) - cents.null_count], pa.int64()),
        }
    )


def disjunctive_band_revenue(sf_dir: str, *, use_bloom: bool = True) -> pa.Table:
    """Revenue from lineitems matching ANY of three (brand, size-range,
    quantity-range) bands — the TPC-H Q19 shape.  Each disjunct
    constrains BOTH join sides at once, so neither scan can evaluate it
    alone: the brand IN-set prunes the part scan (and its bloom the
    lineitem scan), and the full disjunction is evaluated vectorized at
    the join, one pass per band over the block."""
    sf = sf_dir.rstrip("/")
    parts = read_parquet_clean(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_brand").isin([b[0] for b in Q19_BANDS]),
    ).map_batches(_q19_part_side, batch_format="pyarrow").materialize()
    bloom_ref = build_key_bloom(parts, "key") if use_bloom else None
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        _q19_lineitem_side, batch_format="pyarrow", fn_kwargs={"bloom_ref": bloom_ref}
    )
    partials = checked_sort(parts.union(items), "key").map_batches(
        _q19_block, batch_format="pyarrow", batch_size=None
    )
    rows = partials.take_all()
    n = sum(r["n_items"] for r in rows)
    n_valid = sum(r["n_valid"] for r in rows)
    cents = sum(r["cents_sum"] for r in rows) if n_valid else None
    return pa.table(
        {"n_items": pa.array([n], pa.int64()), "revenue_cents": pa.array([cents], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Q8 shape: nation market share within a region (share-of-total per group)
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_8"
Q8_TYPE = "ECONOMY"

NATION_MARKET_SHARE_SQL = f"""
SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN ns.n_name = '{Q8_NATION}'
                     THEN CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS target_cents,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS total_cents
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
JOIN region r   ON nc.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
GROUP BY 1
ORDER BY 1
"""


def _q8_orders_side(batch: pa.Table) -> pa.Table:
    """Probe of the custkey exchange: every order with its calendar
    year (Arrow ``pc.year`` — null-preserving; a null orderdate forms
    the twin's NULL year group)."""
    batch = batch.filter(
        pc.and_(
            pc.is_valid(batch.column("o_custkey")),
            pc.is_valid(batch.column("o_orderkey")),
        )
    )
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_custkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "c_nat": pa.nulls(n, pa.int64()),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "o_year": pc.year(batch.column("o_orderdate")).cast(pa.int64()),
        }
    )


def _q8_hop1_block(block: pa.Table) -> pa.Table:
    """Per custkey run: keep the in-region customers' orders
    (semi-join; the region membership IS the build row)."""
    empty = pa.table(
        {"o_orderkey": pa.array([], pa.int64()), "o_year": pa.array([], pa.int64())}
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    return pa.table(
        {
            "o_orderkey": block.column("o_orderkey").filter(pa.array(keep)),
            "o_year": block.column("o_year").filter(pa.array(keep)),
        }
    )


def _q8_part_side(batch: pa.Table) -> pa.Table:
    keys = pc.unique(batch.column("p_partkey").cast(pa.int64()).combine_chunks())
    keys = keys.filter(pc.is_valid(keys))
    m = len(keys)
    return pa.table(
        {
            "key": keys,
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            "suppkey": pa.nulls(m, pa.int64()),
            "orderkey": pa.nulls(m, pa.int64()),
            "cents": pa.nulls(m, pa.int64()),
        }
    )


def _q8_lineitem_side(batch: pa.Table, part_bloom=None, order_bloom=None) -> pa.Table:
    """Lineitem probe of the partkey exchange — raw (suppkey, orderkey,
    cents) rows, both blooms pruning the scan (FPs die at the exact
    joins)."""
    valid = (
        np.asarray(pc.is_valid(batch.column("l_partkey").combine_chunks()))
        & np.asarray(pc.is_valid(batch.column("l_suppkey").combine_chunks()))
        & np.asarray(pc.is_valid(batch.column("l_orderkey").combine_chunks()))
    )
    if part_bloom is not None:
        bloom = ray.get(part_bloom) if isinstance(part_bloom, ray.ObjectRef) else part_bloom
        keys = np.asarray(
            pc.fill_null(batch.column("l_partkey").cast(pa.int64()).combine_chunks(), 0)
        )
        valid &= bloom_member(keys, bloom)
    if order_bloom is not None:
        bloom = ray.get(order_bloom) if isinstance(order_bloom, ray.ObjectRef) else order_bloom
        keys = np.asarray(
            pc.fill_null(batch.column("l_orderkey").cast(pa.int64()).combine_chunks(), 0)
        )
        valid &= bloom_member(keys, bloom)
    batch = batch.filter(pa.array(valid))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("l_partkey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "suppkey": batch.column("l_suppkey").cast(pa.int64()),
            "orderkey": batch.column("l_orderkey").cast(pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )


def _q8_hop2_block(block: pa.Table) -> pa.Table:
    """Per partkey run: semi-keep type-part lineitems, re-keyed to
    suppkey for the next exchange."""
    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "is_target": pa.array([], pa.int8()),
            "orderkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    m = int(keep.sum())
    return pa.table(
        {
            "key": block.column("suppkey").filter(pa.array(keep)),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "is_target": pa.nulls(m, pa.int8()),
            "orderkey": block.column("orderkey").filter(pa.array(keep)),
            "cents": block.column("cents").filter(pa.array(keep)),
        }
    )


def _q8_supp_side(batch: pa.Table, target_key: int, nation_keys: list[int]) -> pa.Table:
    """Build side of the suppkey exchange.  The twin INNER-joins nation
    on s_nationkey, so a supplier with a NULL or dangling nationkey
    contributes NOTHING (not even to the denominator) — filter against
    the driver-read nation key set, don't just zero the flag."""
    batch = batch.filter(
        pc.and_(
            pc.is_valid(batch.column("s_suppkey")),
            pc.is_in(
                batch.column("s_nationkey").cast(pa.int64()),
                value_set=pa.array(nation_keys, pa.int64()),
            ),
        )
    )
    n = batch.num_rows
    is_t = pc.cast(
        pc.equal(batch.column("s_nationkey").cast(pa.int64()), np.int64(target_key)),
        pa.int8(),
    )
    return pa.table(
        {
            "key": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "is_target": pc.fill_null(is_t, 0),
            "orderkey": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q8_hop3_block(block: pa.Table) -> pa.Table:
    """Per suppkey run: tag lineitems with the supplier's target flag,
    pre-combined per (orderkey, is_target)."""
    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "is_target": pa.array([], pa.int8()),
            "o_year": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "n_valid": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    is_t = np.asarray(pc.fill_null(block.column("is_target"), 0).combine_chunks())
    cents_col = block.column("cents").combine_chunks()
    cents_valid = np.asarray(pc.is_valid(cents_col))
    cents = np.asarray(pc.fill_null(cents_col, 0))
    t = pa.table(
        {
            "orderkey": block.column("orderkey").filter(pa.array(keep)),
            "is_target": pa.array(is_t[np.maximum(build_idx, 0)][keep]),
            "cents": pa.array(cents[keep]),
            "n_valid": pa.array(cents_valid[keep].astype(np.int64)),
        }
    )
    g = t.group_by(["orderkey", "is_target"]).aggregate(
        [("cents", "sum"), ("n_valid", "sum")]
    )
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("orderkey"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "is_target": g.column("is_target").cast(pa.int8()),
            "o_year": pa.nulls(m, pa.int64()),
            "cents": g.column("cents_sum"),
            "n_valid": g.column("n_valid_sum"),
        }
    )


def _q8_order_build_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey"),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "is_target": pa.nulls(n, pa.int8()),
            "o_year": batch.column("o_year"),
            "cents": pa.nulls(n, pa.int64()),
            "n_valid": pa.nulls(n, pa.int64()),
        }
    )


def _q8_hop4_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: attach the order's year to its lineitem
    partials, reduced per (year, is_target).  ``n_valid`` counts
    non-null cents addends so the finalizer can reproduce SQL
    SUM-over-all-null = NULL per year group."""
    empty = pa.table(
        {
            "o_year": pa.array([], pa.int64()),
            "target_cents": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "n_valid": pa.array([], pa.int64()),
            "n_target_addends": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    bi = np.maximum(build_idx, 0)
    is_t = np.asarray(pc.fill_null(block.column("is_target"), 0).combine_chunks())
    cents = np.asarray(pc.fill_null(block.column("cents"), 0).combine_chunks())
    nv = np.asarray(pc.fill_null(block.column("n_valid"), 0).combine_chunks())
    t = pa.table(
        {
            # Arrow group_by keeps a NULL year as ONE group (the twin's
            # NULL year group) — no sentinel, which would collide with
            # the downstream shadow-key machinery's own sentinel
            "o_year": block.column("o_year").take(pa.array(bi[keep].astype(np.int64))),
            "is_target": pa.array(is_t[keep]),
            "cents": pa.array(cents[keep]),
            "n_rows": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            "n_valid": pa.array(nv[keep]),
        }
    )
    g = t.group_by(["o_year", "is_target"]).aggregate(
        [("cents", "sum"), ("n_rows", "sum"), ("n_valid", "sum")]
    )
    tgt = np.asarray(g.column("is_target"), dtype=np.int64)
    c = np.asarray(pc.fill_null(g.column("cents_sum"), 0))
    nrows = np.asarray(pc.fill_null(g.column("n_rows_sum"), 0))
    nvalid = np.asarray(pc.fill_null(g.column("n_valid_sum"), 0))
    # a target-sum addend is non-NULL iff the row is non-target (the
    # CASE's ELSE 0) or its cents are valid
    return pa.table(
        {
            "o_year": g.column("o_year"),
            "target_cents": pa.array(np.where(tgt == 1, c, 0)),
            "total_cents": pa.array(c),
            "n_rows": pa.array(nrows),
            "n_valid": pa.array(nvalid),
            "n_target_addends": pa.array(np.where(tgt == 1, nvalid, nrows)),
        }
    )


def nation_market_share(sf_dir: str, *, use_bloom: bool = True) -> ray.data.Dataset:
    """One nation's share of a part type's revenue among one region's
    customers, per order year — the TPC-H Q8 shape (share-of-total
    within group over a 6-table chain).  FOUR exchanges: custkey
    (region semi-filter tags orders with their year), partkey (type
    semi-filter on the fact), suppkey (target-nation flag), orderkey
    (year meets the flagged partials).  Output is the integer
    (target_cents, total_cents) pair per year — the share is the
    caller's division, which would not be IEEE-stable as a stored
    float."""
    from ray.data.aggregate import Sum

    from .chains import _region_nation_keys

    sf = sf_dir.rstrip("/")
    nat_keys, names = _region_nation_keys(sf, Q8_REGION)
    # ONE driver-side nation read serves the customer-region filter
    # (via _region_nation_keys), the supplier nation-join domain, and
    # the target key (the target may be outside the region — then no
    # row is ever target-flagged, matching the twin)
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"])
    all_nat_keys = [
        k
        for k in nation.column("n_nationkey").cast(pa.int64()).to_pylist()
        if k is not None
    ]
    tmask = pc.equal(nation.column("n_name"), Q8_NATION)
    tkeys = nation.filter(tmask).column("n_nationkey").cast(pa.int64())
    target_key = tkeys[0].as_py() if len(tkeys) else -1

    cust = read_parquet_clean(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(nat_keys),
    ).map_batches(_q7_cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(_q8_orders_side, batch_format="pyarrow")
    # reuse the Q7 hop-1 kernel schema? no — years ride here, so Q8 has
    # its own emit
    u1 = cust.map_batches(
        lambda b: pa.table(
            {
                "key": b.column("key"),
                "side": b.column("side"),
                "c_nat": b.column("c_nat"),
                "o_orderkey": b.column("o_orderkey"),
                "o_year": pa.nulls(b.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    tagged_orders = checked_sort(u1.union(orders), "key").map_batches(
        _q8_hop1_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    order_bloom = build_key_bloom(tagged_orders, "o_orderkey") if use_bloom else None
    parts = read_parquet_clean(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == Q8_TYPE,
    ).map_batches(_q8_part_side, batch_format="pyarrow").materialize()
    part_bloom = build_key_bloom(parts, "key") if use_bloom else None

    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        _q8_lineitem_side,
        batch_format="pyarrow",
        fn_kwargs={"part_bloom": part_bloom, "order_bloom": order_bloom},
    )
    typed = checked_sort(parts.union(items), "key").map_batches(
        _q8_hop2_block, batch_format="pyarrow", batch_size=None
    )

    supp = read_parquet_clean(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        _q8_supp_side,
        batch_format="pyarrow",
        fn_kwargs={"target_key": target_key, "nation_keys": all_nat_keys},
    )
    flagged = checked_sort(supp.union(typed), "key").map_batches(
        _q8_hop3_block, batch_format="pyarrow", batch_size=None
    )

    build4 = tagged_orders.map_batches(_q8_order_build_side, batch_format="pyarrow")
    partials = checked_sort(build4.union(flagged), "key").map_batches(
        _q8_hop4_block, batch_format="pyarrow", batch_size=None
    )
    agg = null_safe_groupby_agg(
        partials,
        "o_year",
        Sum("target_cents", alias_name="target_cents"),
        Sum("total_cents", alias_name="total_cents"),
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_valid", alias_name="n_valid"),
        Sum("n_target_addends", alias_name="n_target_addends"),
        out_types={
            "target_cents": pa.int64(),
            "total_cents": pa.int64(),
            "n_rows": pa.int64(),
            "n_valid": pa.int64(),
            "n_target_addends": pa.int64(),
        },
    )

    def finalize(b: pa.Table) -> pa.Table:
        year = b.column("o_year")
        nv = np.asarray(pc.fill_null(b.column("n_valid"), 0).combine_chunks())
        nta = np.asarray(
            pc.fill_null(b.column("n_target_addends"), 0).combine_chunks()
        )
        total = np.asarray(pc.fill_null(b.column("total_cents"), 0).combine_chunks())
        target = np.asarray(pc.fill_null(b.column("target_cents"), 0).combine_chunks())
        # SQL SUM is NULL iff the year group has zero non-null addends
        return pa.table(
            {
                "o_year": year,
                "target_cents": pa.array(target, pa.int64(), mask=nta == 0),
                "total_cents": pa.array(total, pa.int64(), mask=nv == 0),
            }
        )

    out = null_safe_sort(
        agg.map_batches(finalize, batch_format="pyarrow"), "o_year"
    )
    return compact_small_result(
        out,
        pa.schema(
            [
                ("o_year", pa.int64()),
                ("target_cents", pa.int64()),
                ("total_cents", pa.int64()),
            ]
        ),
    )
