"""Join operators beyond the broadcast lookup: shuffle equi-join,
top-N per group, range (interval) join.

The reference has no joins (SURVEY §2.4); these are the engine-side
primitives a lakehouse pipeline needs, each expressed Ray-Data-first:

- :func:`order_priority_revenue` — a FACT-TO-FACT equi-join
  (lineitem ⋈ orders on orderkey).  Neither side fits a broadcast at
  100 TB, so both sides are co-partitioned through ONE sort exchange on
  the join key (build rows sorting immediately before their probe rows)
  and joined block-wise with vectorized run detection — the Ray Data
  restatement of a shuffle hash join.  Contrast with
  ``relational.events_user_enrich`` (broadcast join, small side only).
- :func:`top_orders_per_cust` — top-N per group via ONE sort on
  (group, -rank keys) + vectorized block-local ranking.  No per-group
  Python, no global window function.
- :func:`quantity_band_counts` — range join against a tiny interval
  table: the band edges broadcast as constants and each batch resolves
  membership with one ``np.searchsorted`` — rows never shuffle for the
  join itself (only the final per-band partials do).

Numeric determinism vs the SQL twins: money is floored cents (identical
IEEE double op order both sides), and every SUM is CAST back to BIGINT
in SQL (DuckDB SUM(BIGINT)→HUGEINT→float64 would break the value hash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.money import discounted_floored_cents, floored_cents
from ..sources.reader import read_parquet_exchange as read_parquet_clean

from ..functions.debug import checked_sort

ORDER_PRIORITY_REVENUE_SQL = """
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY priority
ORDER BY priority
"""


def _orders_side(batch: pa.Table) -> pa.Table:
    # null join keys never match (INNER semantics) and would degrade
    # the kernel's numpy key view to float64+NaN — drop them here
    batch = batch.filter(pc.is_valid(batch.column("o_orderkey")))
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "priority": batch.column("o_orderpriority"),
            "cents": pa.nulls(n, pa.int64()),
            "n": pa.nulls(n, pa.int64()),
        }
    )


def _lineitem_side(batch: pa.Table) -> pa.Table:
    """Probe-side rows, PRE-AGGREGATED per key within the batch (the
    combiner-before-shuffle-join pattern): a TPC-H order has ~4 lineitems
    that usually share a batch, so the sort exchange moves ~4× fewer
    probe rows, each carrying its local (count, cents-sum) partial."""
    batch = batch.filter(pc.is_valid(batch.column("l_orderkey")))
    t = pa.table(
        {
            "key": batch.column("l_orderkey").cast(pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )
    g = t.group_by(["key"]).aggregate([("cents", "sum"), ([], "count_all")])
    m = g.num_rows
    # columns selected by their GENERATED names (version-proof vs
    # positional renames over group_by output ordering)
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "priority": pa.nulls(m, pa.string()),
            "cents": g.column("cents_sum"),
            "n": g.column("count_all"),
        }
    )


def _join_block_partials(block: pa.Table) -> pa.Table:
    """One co-located block: runs of equal key start with the (single)
    build row (side 0), followed by its probe rows (side 1).  Broadcast
    the build attribute down each run with np.repeat, then pre-aggregate
    per priority — only (priority, count, cents) partials leave the task.
    """
    empty = pa.table(
        {
            "priority": pa.array([], pa.string()),
            "n_items": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    # The exchange sorts on `key` ALONE: Ray's co-location guarantee
    # covers runs of the full sort key, not of a prefix — sorting on
    # (key, side) was observed to split runs of bare `key` across block
    # boundaries (caught by NPR_DEBUG_COLOCATION).  The build-first
    # order within each run is established locally instead.
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.nonzero(new_run)[0]
    ends = np.concatenate([starts[1:], [n]])
    # a run joins iff its first row is the build side (orders pk is unique)
    has_build = side[starts] == 0
    run_len = ends - starts
    # per-row index of its run's build row (or -1 when the run has none)
    build_idx = np.repeat(np.where(has_build, starts, -1), run_len)
    probe = (side == 1) & (build_idx >= 0)
    if not probe.any():
        return empty
    pr_codes_all = block.column("priority").combine_chunks().dictionary_encode()
    # +1 shift: slot 0 is the NULL-priority group (SQL GROUP BY keeps
    # it; an unshifted -1 code would crash np.bincount)
    pr_idx = np.asarray(pr_codes_all.indices.fill_null(-1)) + 1
    matched_pr = pr_idx[build_idx[probe]]
    cents = np.asarray(pc.fill_null(block.column("cents"), 0).combine_chunks())[probe]
    # probe rows are per-batch PARTIALS: `n` lineitems folded per row
    n_rows = np.asarray(pc.fill_null(block.column("n"), 0).combine_chunks())[probe]
    # partial agg by (shifted) priority code
    n_codes = len(pr_codes_all.dictionary) + 1
    cnt = np.bincount(matched_pr, weights=n_rows.astype(np.float64), minlength=n_codes)
    csum = np.bincount(matched_pr, weights=cents.astype(np.float64), minlength=n_codes)
    nz = cnt > 0
    # float64 bincount weights are exact for |sum| < 2^53 per (block,
    # priority) partial — block sums are bounded by block size × max
    # cents, far under 2^53; the global sum happens in int64 downstream.
    labels = pa.concat_arrays(
        [pa.array([None], pa.string()), pr_codes_all.dictionary.cast(pa.string())]
    )
    return pa.table(
        {
            "priority": labels.take(pa.array(np.nonzero(nz)[0], pa.int32())),
            "n_items": pa.array(cnt[nz].astype(np.int64)),
            "revenue_cents": pa.array(csum[nz].astype(np.int64)),
        }
    )


def order_priority_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue per order priority: co-partitioned shuffle join + agg.

    Documented partitioning assumption: ``o_orderkey`` is unique in
    orders (a true primary key), so each key run holds at most one build
    row.  Both fact tables move through exactly one sort exchange; the
    post-join shuffle carries only ≤5-row priority partials per block.
    """
    sf = sf_dir.rstrip("/")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(_orders_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(_lineitem_side, batch_format="pyarrow")
    both = orders.union(items)
    partials = checked_sort(both, "key").map_batches(
        _join_block_partials, batch_format="pyarrow", batch_size=None
    )
    from ray.data.aggregate import Sum

    return (
        partials.groupby("priority")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .sort("priority")
    )


# ---------------------------------------------------------------------------
# top-N per group
# ---------------------------------------------------------------------------

TOP_ORDERS_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey, price_cents, rn
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
         ) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


def _project_price_cents(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "o_custkey": batch.column("o_custkey").cast(pa.int64()),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "price_cents": floored_cents(batch.column("o_totalprice")),
        }
    )


def _rank_block(block: pa.Table, n_top: int) -> pa.Table:
    """Rank within co-located customer runs.

    The exchange sorts on the GROUP key alone (a multi-key sort only
    co-locates runs of the full tuple, not the group-key prefix — the
    NPR_DEBUG_COLOCATION guard caught exactly that); the rank order is
    established block-locally."""
    n = block.num_rows
    if n == 0:
        return block.append_column("rn", pa.array([], pa.int64()))
    block = block.sort_by(
        [("o_custkey", "ascending"), ("price_cents", "descending"), ("o_orderkey", "ascending")]
    )
    # fill BEFORE the numpy view: a null custkey surfaces as NaN where
    # NaN != NaN makes every null row its own partition — SQL's
    # PARTITION BY keeps ONE null partition (sort_by groups the nulls
    # contiguously, so one filled value = one run)
    cust = np.asarray(
        pc.fill_null(
            block.column("o_custkey").combine_chunks(), np.iinfo(np.int64).min
        )
    )
    new_run = np.concatenate([[True], cust[1:] != cust[:-1]])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.concatenate([starts, [n]]))
    rn = np.arange(n, dtype=np.int64) - np.repeat(starts, run_len) + 1
    keep = rn <= n_top
    return block.filter(pa.array(keep)).append_column("rn", pa.array(rn[keep]))


def top_orders_per_cust(sf_dir: str, n_top: int = 3) -> ray.data.Dataset:
    """Each customer's top-``n_top`` orders by price: the top-N-per-group
    primitive as ONE sort on (group asc, price desc, key asc) + a
    vectorized block-local rank — no window-function engine needed, no
    per-group Python."""
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    ).map_batches(_project_price_cents, batch_format="pyarrow")
    ds = checked_sort(ds, "o_custkey")
    return ds.map_batches(
        _rank_block, batch_format="pyarrow", batch_size=None, fn_kwargs={"n_top": n_top}
    )


# ---------------------------------------------------------------------------
# anti-join (NOT EXISTS)
# ---------------------------------------------------------------------------

ANTI_PRIORITY = "1-URGENT"

CUSTOMERS_WITHOUT_ORDERS_SQL = f"""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '{ANTI_PRIORITY}'
)
ORDER BY c_custkey
"""


def _anti_left_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_name": batch.column("c_name"),
        }
    )


def _anti_right_keys(batch: pa.Table) -> pa.Table:
    """Right side: filter (priority predicate pushed into the scan task),
    then reduce to per-batch DISTINCT keys (the combiner: a key repeated
    within a batch ships once through the exchange)."""
    batch = batch.filter(pc.equal(batch.column("o_orderpriority"), ANTI_PRIORITY))
    keys = pc.unique(batch.column("o_custkey").cast(pa.int64()).combine_chunks())
    m = len(keys)
    return pa.table(
        {
            "key": keys,
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "c_name": pa.nulls(m, pa.string()),
        }
    )


def _exists_block(block: pa.Table, want_right: bool) -> pa.Table:
    """Keep left rows by run-level EXISTS: anti-join (``want_right=False``,
    the run contains NO right row) or semi-join (``want_right=True``, it
    contains at least one) — the same one-pass mask, flipped."""
    empty = pa.table(
        {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())}
    )
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    run_id = np.cumsum(new_run) - 1
    n_runs = run_id[-1] + 1
    has_right = np.zeros(n_runs, dtype=bool)
    np.logical_or.at(has_right, run_id, side == 1)
    keep = (side == 0) & (has_right[run_id] if want_right else ~has_right[run_id])
    if not keep.any():
        return empty
    kept = block.filter(pa.array(keep))
    return pa.table({"c_custkey": kept.column("key"), "c_name": kept.column("c_name")})


def _anti_block(block: pa.Table) -> pa.Table:
    return _exists_block(block, want_right=False)


def customers_without_orders(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """ANTI-join (NOT EXISTS): customers with no URGENT order — the
    missing-side member of the join family.  Neither side broadcasts:
    both key streams are co-partitioned through ONE sort exchange (right
    side filtered then pre-deduped per batch, so the exchange moves ≤1
    row per distinct right key per batch) and the block-local pass keeps
    left rows whose run has no right row.  A semi-join is the same shape
    with the keep mask flipped.
    """
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_anti_left_side, batch_format="pyarrow")
    right = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(_anti_right_keys, batch_format="pyarrow")
    out = checked_sort(left.union(right), "key").map_batches(
        _anti_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("c_custkey") if sort else out


CUSTOMERS_WITH_URGENT_ORDERS_SQL = f"""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '{ANTI_PRIORITY}'
)
ORDER BY c_custkey
"""


def customers_with_urgent_orders(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """SEMI-join (EXISTS): customers holding at least one URGENT order —
    the same co-partitioned one-sort pipeline as the anti-join with the
    run-level mask flipped (and the same scale properties: right side
    pre-deduped per batch, left rows never duplicated by multiplicity)."""
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_anti_left_side, batch_format="pyarrow")
    right = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(_anti_right_keys, batch_format="pyarrow")
    out = checked_sort(left.union(right), "key").map_batches(
        _exists_block, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"want_right": True},
    )
    return out.sort("c_custkey") if sort else out


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------

# Quantity bands [lo, hi): l_quantity in TPC-H is integer-valued 1..50.
QUANTITY_BANDS = (("q1", 1, 13), ("q2", 13, 26), ("q3", 26, 38), ("q4", 38, 51))

QUANTITY_BAND_COUNTS_SQL = f"""
WITH bands(band, lo, hi) AS (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in QUANTITY_BANDS)})
SELECT b.band,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY b.band
ORDER BY b.band
"""


def _band_partials(batch: pa.Table) -> pa.Table:
    """Interval membership via one searchsorted against the band edges —
    the vectorized form of a BETWEEN join against a broadcast-small
    interval table — then a per-batch partial aggregate."""
    q = np.asarray(batch.column("l_quantity"), dtype=np.float64)
    p = np.asarray(batch.column("l_extendedprice"), dtype=np.float64)
    cents = np.floor(p * 100).astype(np.int64)
    edges = np.array([b[1] for b in QUANTITY_BANDS] + [QUANTITY_BANDS[-1][2]], dtype=np.float64)
    idx = np.searchsorted(edges, q, side="right") - 1
    in_band = (idx >= 0) & (idx < len(QUANTITY_BANDS)) & (q < edges[-1])
    idx = idx[in_band]
    cents = cents[in_band]
    cnt = np.bincount(idx, minlength=len(QUANTITY_BANDS))
    csum = np.bincount(idx, weights=cents.astype(np.float64), minlength=len(QUANTITY_BANDS))
    nz = cnt > 0
    labels = np.array([b[0] for b in QUANTITY_BANDS])
    return pa.table(
        {
            "band": pa.array(labels[nz]),
            "n_rows": pa.array(cnt[nz].astype(np.int64)),
            "price_cents": pa.array(csum[nz].astype(np.int64)),
        }
    )


def quantity_band_counts(sf_dir: str) -> ray.data.Dataset:
    """Row counts + price sums per quantity band (range join + agg)."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    partials = ds.map_batches(_band_partials, batch_format="pyarrow")
    return (
        partials.groupby("band")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("price_cents", alias_name="price_cents"))
        .sort("band")
    )


# ---------------------------------------------------------------------------
# set operations (INTERSECT)
# ---------------------------------------------------------------------------

ACTIVE_CUSTOMER_IDS_SQL = """
SELECT DISTINCT user_id AS custkey FROM events
INTERSECT
SELECT c_custkey FROM customer
ORDER BY custkey
"""


def _set_side(col: str, side: int):
    """Per-batch DISTINCT non-null keys, side-tagged.

    Set ops here are defined over NON-NULL keys (the twins filter
    nulls explicitly): a null key would surface as NaN in the block
    kernel's numpy view, where NaN != NaN makes every null its own run
    and the int64 cast of NaN is undefined — and a cross-side null
    match cannot be decided block-locally anyway (each side's single
    null partial may land in different blocks)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = pc.unique(pc.drop_null(batch.column(col).cast(pa.int64()).combine_chunks()))
        return pa.table(
            {
                "key": keys,
                "side": pa.array(np.full(len(keys), side, dtype=np.int8)),
            }
        )

    return fn


def _set_op_block(block: pa.Table, keep_of) -> pa.Table:
    """Shared set-operation kernel: one boolean (run × side) presence
    matrix per co-located key run; ``keep_of(has)`` is the mask that
    distinguishes INTERSECT / EXCEPT (and any future member)."""
    empty = pa.table({"custkey": pa.array([], pa.int64())})
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    run_id = np.cumsum(new_run) - 1
    n_runs = run_id[-1] + 1
    has = np.zeros((n_runs, 2), dtype=bool)
    has[run_id, side] = True
    out = key[np.nonzero(new_run)[0]][keep_of(has)]
    return pa.table({"custkey": pa.array(out.astype(np.int64))})


def _intersect_block(block: pa.Table) -> pa.Table:
    """Emit each co-located key once iff its run contains BOTH sides."""
    return _set_op_block(block, lambda has: has.all(axis=1))


def active_customer_ids(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """INTERSECT — the set-operation primitive: distinct event user ids
    that are also customer keys.  Both sides reduce to per-batch DISTINCT
    keys before the ONE sort exchange (a key repeated in a batch ships
    once), then a run-level both-sides mask emits each key at most once.
    UNION ALL/EXCEPT fall out of the same shape by changing the mask."""
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(f"{sf}/events.parquet", columns=["user_id"]).map_batches(
        _set_side("user_id", 0), batch_format="pyarrow"
    )
    right = read_parquet_clean(f"{sf}/customer.parquet", columns=["c_custkey"]).map_batches(
        _set_side("c_custkey", 1), batch_format="pyarrow"
    )
    out = checked_sort(left.union(right), "key").map_batches(
        _intersect_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("custkey") if sort else out


# ---------------------------------------------------------------------------
# fact-to-dim shuffle join: lineitem ⋈ part → revenue per brand
# ---------------------------------------------------------------------------

BRAND_REVENUE_SQL = """
SELECT p.p_brand AS brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY brand
ORDER BY brand
"""


def _part_side(batch: pa.Table) -> pa.Table:
    """Build side: part is a DIMENSION but not a broadcastable one at
    100 TB (SF100k part is ~20 B rows), so it goes through the same
    co-partitioned sort exchange as the fact side — the internal
    exchange schema reuses the (key, side, priority, cents, n) layout of
    :func:`_join_block_partials`, with `priority` carrying p_brand."""
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("p_partkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "priority": batch.column("p_brand"),
            "cents": pa.nulls(n, pa.int64()),
            "n": pa.nulls(n, pa.int64()),
        }
    )


def _lineitem_part_side(batch: pa.Table) -> pa.Table:
    """Probe side pre-aggregated per partkey within the batch (combiner
    before the shuffle, as in :func:`_lineitem_side`)."""
    t = pa.table(
        {
            "key": batch.column("l_partkey").cast(pa.int64()),
            "cents": discounted_floored_cents(
                batch.column("l_extendedprice"), batch.column("l_discount")
            ),
        }
    )
    g = t.group_by(["key"]).aggregate([("cents", "sum"), ([], "count_all")])
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "priority": pa.nulls(m, pa.string()),
            "cents": g.column("cents_sum"),
            "n": g.column("count_all"),
        }
    )


def brand_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue per part brand: the fact-to-dim co-partitioned shuffle
    join (lineitem ⋈ part on partkey), sharing the one-sort-exchange
    block machinery with :func:`order_priority_revenue` — p_partkey is
    the unique build key, the probe side ships per-batch partials, and
    only ≤(n_brands)-row partials re-shuffle after the join.
    """
    from ray.data.aggregate import Sum

    sf = sf_dir.rstrip("/")
    parts = read_parquet_clean(
        f"{sf}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(_part_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet", columns=["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(_lineitem_part_side, batch_format="pyarrow")
    partials = checked_sort(parts.union(items), "key").map_batches(
        _join_block_partials, batch_format="pyarrow", batch_size=None
    )
    agg = partials.groupby("priority").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "brand": b.column("priority"),
                "n_items": b.column("n_items"),
                "revenue_cents": b.column("revenue_cents"),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("brand")


# ---------------------------------------------------------------------------
# multi-way (3-table) join: the TPC-H-Q3 shape
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-01-01"  # orders strictly before, shipments strictly after

SHIPPING_PRIORITY_SQL = f"""
SELECT l.l_orderkey AS o_orderkey,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_cents DESC, o.o_orderdate, o_orderkey
LIMIT 10
"""


def _q3_cust_side(batch: pa.Table) -> pa.Table:
    """Semi-join build side: DISTINCT keys of segment customers (the
    predicate is pushed into the scan; c_custkey is a pk, but dedup
    keeps the contract explicit)."""
    keys = pc.unique(batch.column("c_custkey").cast(pa.int64()).combine_chunks())
    m = len(keys)
    return pa.table(
        {
            "key": keys,
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            "o_orderkey": pa.nulls(m, pa.int64()),
            "o_orderdate": pa.nulls(m, pa.timestamp("us")),
        }
    )


def _q3_orders_side(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "key": batch.column("o_custkey").cast(pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "o_orderdate": batch.column("o_orderdate"),
        }
    )


def _semi_emit_block(block: pa.Table) -> pa.Table:
    """Per co-located key run: if a build row (side 0) is present, emit
    the run's probe rows' payload columns — a semi-join that KEEPS the
    probe payload (unlike :func:`_exists_block`, which keeps the build
    side).  Used as the first exchange of multi-way join chains."""
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    run_id = np.cumsum(new_run) - 1
    has_build = np.zeros(run_id[-1] + 1, dtype=bool)
    np.logical_or.at(has_build, run_id, side == 0)
    keep = (side == 1) & has_build[run_id]
    if not keep.any():
        return empty
    kept = block.filter(pa.array(keep))
    return pa.table(
        {"o_orderkey": kept.column("o_orderkey"), "o_orderdate": kept.column("o_orderdate")}
    )


def _q3_order_build_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "o_orderdate": batch.column("o_orderdate"),
            "cents": pa.nulls(n, pa.int64()),
        }
    )


def _q3_lineitem_side(batch: pa.Table) -> pa.Table:
    """Probe side pre-aggregated per orderkey within the batch (the
    shipdate predicate is pushed into the scan)."""
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
            "o_orderdate": pa.nulls(m, pa.timestamp("us")),
            "cents": g.column("cents_sum"),
        }
    )


def _q3_join_block(block: pa.Table) -> pa.Table:
    """Inner join per run (unique build key): one output row per run
    that has BOTH the build row and ≥1 probe partial, revenue = the
    run's summed partials.  The run IS the GROUP BY (l_orderkey,
    o_orderdate) group — orderdate is functionally dependent on the
    unique orderkey — so no further aggregation exchange is needed."""
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.concatenate([starts, [n]]))
    has_build = side[starts] == 0
    has_probe = run_len > has_build.astype(np.int64)  # any row beyond the build one
    cents = np.asarray(pc.fill_null(block.column("cents"), 0).combine_chunks())
    run_cents = np.add.reduceat(cents, starts)
    keep = has_build & has_probe
    if not keep.any():
        return empty
    idx = pa.array(starts[keep].astype(np.int64))
    return pa.table(
        {
            "o_orderkey": pa.array(key[starts[keep]].astype(np.int64)),
            "revenue_cents": pa.array(run_cents[keep].astype(np.int64)),
            "o_orderdate": block.column("o_orderdate").take(idx),
        }
    )


def shipping_priority(sf_dir: str, n_top: int = 10) -> ray.data.Dataset:
    """Multi-way join (the TPC-H Q3 shape): segment customers ⋈ orders
    ⋈ lineitem → top-``n_top`` open orders by outstanding revenue.

    Two co-partitioned sort exchanges chain: (1) on ``custkey`` — the
    segment-customer key stream semi-filters the date-filtered orders
    (emitting only (orderkey, orderdate)); (2) on ``orderkey`` — the
    surviving orders join the shipdate-filtered lineitem partials.  All
    predicates are pushed into the parquet scans, every probe side ships
    per-batch partials, and only ≤1 row per surviving order leaves the
    second exchange — the final top-k sort sees orders, not lineitems.
    Deterministic order: (revenue desc, orderdate asc, orderkey asc),
    a total order because orderkey is unique.
    """
    import pyarrow.compute as _pc

    sf = sf_dir.rstrip("/")
    cut = pa.scalar(np.datetime64(Q3_CUTOFF, "us"), pa.timestamp("us"))
    cust = read_parquet_clean(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=_pc.field("c_mktsegment") == Q3_SEGMENT,
    ).map_batches(_q3_cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=_pc.field("o_orderdate") < cut,
    ).map_batches(_q3_orders_side, batch_format="pyarrow")
    open_orders = checked_sort(cust.union(orders), "key").map_batches(
        _semi_emit_block, batch_format="pyarrow", batch_size=None
    )
    build = open_orders.map_batches(_q3_order_build_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=_pc.field("l_shipdate") > cut,
    ).map_batches(_q3_lineitem_side, batch_format="pyarrow")
    joined = checked_sort(build.union(items), "key").map_batches(
        _q3_join_block, batch_format="pyarrow", batch_size=None
    )
    return joined.sort(
        ["revenue_cents", "o_orderdate", "o_orderkey"], descending=[True, False, False]
    ).limit(n_top)


# ---------------------------------------------------------------------------
# set operation: EXCEPT
# ---------------------------------------------------------------------------

INACTIVE_CUSTOMER_IDS_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_custkey IS NOT NULL
EXCEPT
SELECT user_id FROM events WHERE user_id IS NOT NULL
ORDER BY custkey
"""


def _except_block(block: pa.Table) -> pa.Table:
    """Emit each co-located key once iff its run has side 0 (customer)
    and NOT side 1 (events) — the EXCEPT mask over the shared
    :func:`_set_op_block` kernel."""
    return _set_op_block(block, lambda has: has[:, 0] & ~has[:, 1])


def inactive_customer_ids(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """EXCEPT — customer keys with NO event activity: the complement
    member of the set-operation family (same per-batch key dedup + ONE
    sort exchange as the INTERSECT, with the run mask flipped to
    left-and-not-right)."""
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(f"{sf}/customer.parquet", columns=["c_custkey"]).map_batches(
        _set_side("c_custkey", 0), batch_format="pyarrow"
    )
    right = read_parquet_clean(f"{sf}/events.parquet", columns=["user_id"]).map_batches(
        _set_side("user_id", 1), batch_format="pyarrow"
    )
    out = checked_sort(left.union(right), "key").map_batches(
        _except_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("custkey") if sort else out


# ---------------------------------------------------------------------------
# LEFT OUTER join: every customer with its order count / spend (0 if none)
# ---------------------------------------------------------------------------

CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
         AS spend_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY c.c_custkey
"""


def _cust_left_side(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "key": batch.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "c_name": batch.column("c_name"),
            "cents": pa.nulls(n, pa.int64()),
            "n": pa.nulls(n, pa.int64()),
        }
    )


def _orders_agg_side(batch: pa.Table) -> pa.Table:
    """Right side pre-aggregated per custkey within the batch."""
    t = pa.table(
        {
            "key": batch.column("o_custkey").cast(pa.int64()),
            "cents": floored_cents(batch.column("o_totalprice")),
        }
    )
    g = t.group_by(["key"]).aggregate([("cents", "sum"), ([], "count_all")])
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "c_name": pa.nulls(m, pa.string()),
            "cents": g.column("cents_sum"),
            "n": g.column("count_all"),
        }
    )


def _left_outer_block(block: pa.Table) -> pa.Table:
    """Per run (one left row + 0..n right partials): emit the left row
    with the run's summed right partials, zero-filled when no right row
    exists — LEFT OUTER semantics, one output row per left row."""
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "spend_cents": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.nonzero(new_run)[0]
    has_left = side[starts] == 0
    if not has_left.any():
        return empty
    cents = np.asarray(pc.fill_null(block.column("cents"), 0).combine_chunks())
    cnt = np.asarray(pc.fill_null(block.column("n"), 0).combine_chunks())
    run_cents = np.add.reduceat(cents, starts)
    run_n = np.add.reduceat(cnt, starts)
    keep = starts[has_left]
    return pa.table(
        {
            "c_custkey": pa.array(key[keep].astype(np.int64)),
            "c_name": block.column("c_name").take(pa.array(keep, pa.int64())),
            "n_orders": pa.array(run_n[has_left].astype(np.int64)),
            "spend_cents": pa.array(run_cents[has_left].astype(np.int64)),
        }
    )


def customer_order_counts(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """LEFT OUTER join + aggregate: every customer with its order count
    and lifetime spend, zero-filled for order-less customers — the
    outer member of the join family.  Same ONE-sort co-partitioned
    exchange; the right side ships per-batch (count, cents) partials, so
    run length is bounded by batches-touching-the-key, not order count.
    """
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_cust_left_side, batch_format="pyarrow")
    right = read_parquet_clean(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(_orders_agg_side, batch_format="pyarrow")
    out = checked_sort(left.union(right), "key").map_batches(
        _left_outer_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("c_custkey") if sort else out


# ---------------------------------------------------------------------------
# FULL OUTER join: customers ∪ event users with activity counts
# ---------------------------------------------------------------------------

CUSTOMER_ACTIVITY_FULL_SQL = """
SELECT COALESCE(c.c_custkey, e.user_id) AS custkey,
       c.c_name,
       CAST(COUNT(e.user_id) AS BIGINT) AS n_events
FROM customer c
FULL JOIN (SELECT user_id FROM events WHERE user_id IS NOT NULL) e
  ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY 1
"""


def _events_count_side(batch: pa.Table) -> pa.Table:
    """Right side: per-batch event counts per user (count partials).
    Null user_ids are excluded — the twin filters them too (a null key
    can neither match nor be decided block-locally; see _set_side)."""
    g = (
        pa.table({"key": pc.drop_null(batch.column("user_id").cast(pa.int64()).combine_chunks())})
        .group_by(["key"])
        .aggregate([([], "count_all")])
    )
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "c_name": pa.nulls(m, pa.string()),
            "cents": pa.nulls(m, pa.int64()),
            "n": g.column("count_all"),
        }
    )


def _full_outer_block(block: pa.Table) -> pa.Table:
    """One output row per co-located key run: the left attributes when a
    left row exists (NULL otherwise), the summed right count partials
    (0 otherwise) — FULL OUTER semantics over the shared exchange."""
    empty = pa.table(
        {
            "custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    block = block.sort_by([("key", "ascending"), ("side", "ascending")])
    key = np.asarray(block.column("key"))
    side = np.asarray(block.column("side"))
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.nonzero(new_run)[0]
    has_left = side[starts] == 0
    cnt = np.asarray(pc.fill_null(block.column("n"), 0).combine_chunks())
    run_n = np.add.reduceat(cnt, starts)
    # c_name: take the run-start row where it's the left row, else null
    name_idx = pa.array(starts.astype(np.int64))
    names = block.column("c_name").take(name_idx)
    names = pc.if_else(pa.array(has_left), names, pa.nulls(len(starts), pa.string()))
    return pa.table(
        {
            "custkey": pa.array(key[starts].astype(np.int64)),
            "c_name": names,
            "n_events": pa.array(run_n.astype(np.int64)),
        }
    )


def customer_activity_full(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """FULL OUTER join + aggregate: the union of customer keys and event
    user ids, with per-key event counts — zero for inactive customers,
    NULL name for non-customer users.  Completes the join family
    (inner ×2, semi, anti, left-outer, full-outer, as-of, range) on the
    same ONE-sort co-partitioned exchange."""
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_cust_left_side, batch_format="pyarrow")
    right = read_parquet_clean(f"{sf}/events.parquet", columns=["user_id"]).map_batches(
        _events_count_side, batch_format="pyarrow"
    )
    out = checked_sort(left.union(right), "key").map_batches(
        _full_outer_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("custkey") if sort else out


# ---------------------------------------------------------------------------
# set operation: UNION (distinct)
# ---------------------------------------------------------------------------

# set ops are over NON-NULL keys (see _set_side) — the twins say so too
ALL_ACTOR_IDS_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_custkey IS NOT NULL
UNION
SELECT user_id FROM events WHERE user_id IS NOT NULL
ORDER BY custkey
"""


def _union_block(block: pa.Table) -> pa.Table:
    """Every co-located key run emits once — UNION-distinct over the
    shared :func:`_set_op_block` kernel (the always-true mask)."""
    return _set_op_block(block, lambda has: np.ones(len(has), dtype=bool))


def all_actor_ids(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """UNION (distinct) — every id that is a customer key OR an event
    user id, once.  Completes the set-operation family (INTERSECT /
    EXCEPT / UNION) on the identical per-batch-dedup + ONE-sort-exchange
    shape; only the run mask differs."""
    sf = sf_dir.rstrip("/")
    left = read_parquet_clean(f"{sf}/customer.parquet", columns=["c_custkey"]).map_batches(
        _set_side("c_custkey", 0), batch_format="pyarrow"
    )
    right = read_parquet_clean(f"{sf}/events.parquet", columns=["user_id"]).map_batches(
        _set_side("user_id", 1), batch_format="pyarrow"
    )
    out = checked_sort(left.union(right), "key").map_batches(
        _union_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("custkey") if sort else out


# ---------------------------------------------------------------------------
# fact-to-fact join with date arithmetic: shipping delay per priority
# ---------------------------------------------------------------------------

_US_PER_DAY_J = 86_400_000_000

SHIP_DELAY_PROFILE_SQL = f"""
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(epoch_us(l.l_shipdate) // {_US_PER_DAY_J}
                     - epoch_us(o.o_orderdate) // {_US_PER_DAY_J} AS BIGINT))
            AS BIGINT) AS delay_days_sum,
       CAST(MIN(CAST(epoch_us(l.l_shipdate) // {_US_PER_DAY_J}
                     - epoch_us(o.o_orderdate) // {_US_PER_DAY_J} AS BIGINT))
            AS BIGINT) AS delay_days_min,
       CAST(MAX(CAST(epoch_us(l.l_shipdate) // {_US_PER_DAY_J}
                     - epoch_us(o.o_orderdate) // {_US_PER_DAY_J} AS BIGINT))
            AS BIGINT) AS delay_days_max
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
-- null dates are excluded on BOTH sides: mixing them would let COUNT(*)
-- count rows whose delay expression SUM/MIN/MAX skip (engine partials
-- would then disagree with the twin on exactly those rows)
WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
GROUP BY priority
ORDER BY priority
"""


def _delay_orders_side(batch: pa.Table) -> pa.Table:
    batch = batch.filter(pc.is_valid(batch.column("o_orderdate")))
    n = batch.num_rows
    day = batch.column("o_orderdate").cast(pa.int64())
    return pa.table(
        {
            "key": batch.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "priority": batch.column("o_orderpriority"),
            "order_day": pc.divide(day, _US_PER_DAY_J),  # positive epochs
            "n": pa.nulls(n, pa.int64()),
            "ship_sum": pa.nulls(n, pa.int64()),
            "ship_min": pa.nulls(n, pa.int64()),
            "ship_max": pa.nulls(n, pa.int64()),
        }
    )


def _delay_lineitem_side(batch: pa.Table) -> pa.Table:
    """Probe partials per orderkey: the delay needs the build side's
    order date, but (count, Σ ship_day, min, max) pre-aggregate exactly
    — delay stats recover as Σship − n·order_day etc. in the kernel."""
    batch = batch.filter(pc.is_valid(batch.column("l_shipdate")))
    days = pc.divide(batch.column("l_shipdate").cast(pa.int64()), _US_PER_DAY_J)
    t = pa.table({"key": batch.column("l_orderkey").cast(pa.int64()), "d": days})
    g = t.group_by(["key"]).aggregate(
        [("d", "sum"), ("d", "min"), ("d", "max"), ([], "count_all")]
    )
    m = g.num_rows
    return pa.table(
        {
            "key": g.column("key"),
            "side": pa.array(np.ones(m, dtype=np.int8)),
            "priority": pa.nulls(m, pa.string()),
            "order_day": pa.nulls(m, pa.int64()),
            "n": g.column("count_all").cast(pa.int64()),
            "ship_sum": g.column("d_sum"),
            "ship_min": g.column("d_min"),
            "ship_max": g.column("d_max"),
        }
    )


def _delay_join_block(block: pa.Table) -> pa.Table:
    """Per orderkey run: convert ship-day partials to delay partials
    using the build row's order day, then fold per priority."""
    from ..functions.blocks import sorted_build_probe_runs

    empty = pa.table(
        {
            "priority": pa.array([], pa.string()),
            "n_items": pa.array([], pa.int64()),
            "delay_days_sum": pa.array([], pa.int64()),
            "delay_days_min": pa.array([], pa.int64()),
            "delay_days_max": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    block, key, side, starts, run_len, build_idx = sorted_build_probe_runs(block)
    keep = (side == 1) & (build_idx >= 0)
    if not keep.any():
        return empty
    order_day = np.asarray(pc.fill_null(block.column("order_day"), 0).combine_chunks())
    pr_codes = block.column("priority").combine_chunks().dictionary_encode()
    pr_idx = np.asarray(pc.fill_null(pr_codes.indices, -1))
    bi = build_idx[keep]
    n = np.asarray(pc.fill_null(block.column("n"), 0).combine_chunks())[keep]
    ssum = np.asarray(pc.fill_null(block.column("ship_sum"), 0).combine_chunks())[keep]
    smin = np.asarray(pc.fill_null(block.column("ship_min"), 0).combine_chunks())[keep]
    smax = np.asarray(pc.fill_null(block.column("ship_max"), 0).combine_chunks())[keep]
    od = order_day[bi]
    d_sum = ssum - n * od
    d_min = smin - od
    d_max = smax - od
    code = pr_idx[bi]
    order = np.argsort(code, kind="stable")
    code_s = code[order]
    seg = np.concatenate([[True], code_s[1:] != code_s[:-1]])
    idx = np.nonzero(seg)[0]
    out_codes = code_s[idx]
    return pa.table(
        {
            "priority": pr_codes.dictionary.take(pa.array(out_codes, pa.int32())),
            "n_items": pa.array(np.add.reduceat(n[order], idx).astype(np.int64)),
            "delay_days_sum": pa.array(np.add.reduceat(d_sum[order], idx).astype(np.int64)),
            "delay_days_min": pa.array(np.minimum.reduceat(d_min[order], idx).astype(np.int64)),
            "delay_days_max": pa.array(np.maximum.reduceat(d_max[order], idx).astype(np.int64)),
        }
    )


def ship_delay_profile(sf_dir: str) -> ray.data.Dataset:
    """Shipping delay (days between order and line shipment) per order
    priority: the fact-to-fact join where the MEASURE spans both sides.
    The probe side still pre-aggregates exactly — (count, Σ, min, max)
    of ship days per orderkey recover the delay stats once the build
    row's order day is known — so the exchange ships per-batch partials,
    never lineitems.  Min/max/sum survive a second fold, so the final
    per-priority groupby is a plain partial merge."""
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.debug import null_safe_groupby_agg

    sf = sf_dir.rstrip("/")
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).map_batches(_delay_orders_side, batch_format="pyarrow")
    items = read_parquet_clean(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(_delay_lineitem_side, batch_format="pyarrow")
    partials = checked_sort(orders.union(items), "key").map_batches(
        _delay_join_block, batch_format="pyarrow", batch_size=None
    )
    out = null_safe_groupby_agg(
        partials,
        "priority",
        Sum("n_items", alias_name="n_items"),
        Sum("delay_days_sum", alias_name="delay_days_sum"),
        Min("delay_days_min", alias_name="delay_days_min"),
        Max("delay_days_max", alias_name="delay_days_max"),
        out_types={
            "n_items": pa.int64(),
            "delay_days_sum": pa.int64(),
            "delay_days_min": pa.int64(),
            "delay_days_max": pa.int64(),
        },
    )
    return out.sort("priority")
