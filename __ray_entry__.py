"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

The CDC queries derive a deterministic change stream from the `events`
table (``nifi_processors_ray.synth.CHANGELOG_FROM_EVENTS_CTE`` is the
SQL twin of the Python derivation — tested in lockstep), replay it
through the engine, and expose the converged lake / rejected / lineage
tables.  Ray is initialised by the driver BEFORE this module is
imported: nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.ops import dedup as _dedup
from nifi_processors_ray.ops import events as _ev
from nifi_processors_ray.ops import chains as _chains
from nifi_processors_ray.ops import subqueries as _subq
from nifi_processors_ray.ops import joins as _joins
from nifi_processors_ray.ops import profile as _prof
from nifi_processors_ray.ops import relational as _rel
from nifi_processors_ray.ops import multimodal as _mm
from nifi_processors_ray.ops import similarity as _sim
from nifi_processors_ray.ops import text as _text
from nifi_processors_ray.ops import vectors as _vec
from nifi_processors_ray.ops import warehouse as _wh
from nifi_processors_ray.pipelines import corpus as _corpus
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import (
    CHANGELOG_FROM_EVENTS_CTE,
    VALID_PREDICATE_SQL,
    write_changelog_from_events,
)


def _changelog_dir(sf_dir: str) -> str:
    """Derive (once, cached) the changelog for a given sf_dir.

    The cache tag includes the source events.parquet's (mtime, size) so a
    REGENERATED events table invalidates the cache — keying on the path
    alone would silently replay a stale stream against an oracle computed
    from the new data (shared recipe: functions/filecache.source_tag)."""
    from nifi_processors_ray.functions.filecache import source_tag

    src = os.path.join(sf_dir, "events.parquet")
    tag = source_tag(src)
    out = os.path.join(tempfile.gettempdir(), f"npr_changelog_{tag}")
    write_changelog_from_events(sf_dir, out, files=4)
    return out


# Replayed engines are cached per (sf_dir, overrides): the CDC queries
# share one converged lake instead of re-replaying (and re-leaking a
# /tmp lake) per query.  Results are identical by the replay-determinism
# invariant the tests pin.
_ENGINE_CACHE: dict[tuple, CdcEngine] = {}

# The cached lakes live under /tmp for the process lifetime; without
# cleanup every driver/pytest run leaks a handful of lake directories
# (observed: 137 after one round of runs).
_cleanup_lakes_at_exit: list[str] = []


def _rm_cached_lakes() -> None:  # pragma: no cover - exit hook
    import shutil

    for d in _cleanup_lakes_at_exit:
        shutil.rmtree(d, ignore_errors=True)


import atexit as _atexit

_atexit.register(_rm_cached_lakes)


def _replayed_engine(sf_dir: str, **over) -> CdcEngine:
    """Converged lake for sf_dir (cached per override set).

    The key includes the source events.parquet's (mtime_ns, size): if the
    table is regenerated mid-process the changelog cache rebuilds, and
    without this the engine cache would keep serving the stale lake."""
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = (
        os.path.abspath(sf_dir),
        st.st_mtime_ns,
        st.st_size,
        tuple(sorted(over.items())),
    )
    eng = _ENGINE_CACHE.get(key)
    if eng is not None:
        return eng
    eng = _fresh_engine(sf_dir, **over)
    eng.replay()
    _ENGINE_CACHE[key] = eng
    return eng


# the one home for the standard query-engine config — placement is a
# pure function of these values, so a second copy that drifted would
# silently build an incompatible lake
_STD_ENGINE_KW = dict(num_partitions=16, salt_factor=4, epoch_events=5_000_000)


def _fresh_engine(sf_dir: str, **over) -> CdcEngine:
    """A NEW lake (never the shared cache) with the standard config —
    shared by the cached replay path and state-mutating queries."""
    lake = tempfile.mkdtemp(prefix="npr_lake_")
    _cleanup_lakes_at_exit.append(lake)
    kwargs = dict(lake_dir=lake, changelog_paths=(_changelog_dir(sf_dir),))
    kwargs.update(_STD_ENGINE_KW)
    kwargs.update(over)
    return CdcEngine(EngineConfig(**kwargs))


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline: CDC replay of the sf0.001-derived change stream
    to a converged lake; returns the final transcript table."""
    eng = _replayed_engine("/root/testdata/sf0.001")
    return eng.final_state(sort=True)


def _q_cdc_replay(sf_dir: str):
    return _replayed_engine(sf_dir).final_state(sort=True)


def _q_cdc_replay_mor(sf_dir: str):
    """Same replay under merge-on-read in multiple epochs (delta writes +
    automatic compaction actually exercised) — must converge to the
    identical state, verified against the same SQL oracle as cdc_replay.

    Epoch size adapts to the stream (~4 epochs at any sf) so the delta
    path runs everywhere without drowning large sfs in commit barriers."""
    return _mor_engine(sf_dir).final_state(sort=True)


def _mor_engine(sf_dir: str) -> CdcEngine:
    """The multi-epoch merge-on-read engine (~4 epochs at any sf) —
    shared by the MOR-convergence, time-travel and changefeed queries
    (one replay, one cache entry)."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    return _replayed_engine(
        sf_dir, merge_mode="mor", compact_threshold=3, epoch_events=max(2_000, n // 4)
    )


def _republished_engine(sf_dir: str, suffix: str, export_fn):
    """Replayed engine over a re-publication of the parquet change log in
    another format (derived once per changelog cache, `_DONE`-marked)."""
    pq_log = _changelog_dir(sf_dir)
    out = pq_log.rstrip("/") + suffix
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        export_fn(pq_log, out)
        with open(marker, "w") as f:
            f.write("")
    return _replayed_engine(sf_dir, changelog_paths=(out,))


def _q_cdc_replay_jsonl(sf_dir: str):
    """The SAME replay over a JSONL re-publication of the change stream —
    the JSON-stream ingest surface (the reference's payloads are JSON),
    checked against the identical SQL oracle: format must not change
    semantics."""
    from nifi_processors_ray.synth import export_changelog_jsonl

    return _republished_engine(sf_dir, "_jsonl", export_changelog_jsonl).final_state(
        sort=True
    )


def _q_cdc_time_travel(sf_dir: str):
    """Snapshot-isolation time travel: the lake AS OF epoch 2's commit
    (or the only epoch on short streams) read from the immutable
    manifest snapshot — the Iceberg/Delta ``VERSION AS OF`` surface.
    The SQL twin replays the changelog only up to that epoch's
    watermark: min(2·E − 1, head) with E = the engine's epoch size."""
    eng = _mor_engine(sf_dir)
    return eng.state_at(min(2, eng.store.latest().epoch), sort=True)


def _q_cdc_state_diff(sf_dir: str):
    """Snapshot-to-snapshot audit diff: keys whose resolved value differs
    between the epoch-2 commit and head, classified added/updated/
    deleted — computed per partition with no shuffle (both snapshots
    share the partitioner).  The diff is small by construction (changed
    keys only), so the driver surface materializes it to a schema-stable
    Arrow table (an all-empty Dataset loses its schema through
    ``to_pandas``; a short stream where epoch 2 IS head legitimately
    diffs to zero rows)."""
    import pyarrow as pa
    import ray as _ray

    eng = _mor_engine(sf_dir)
    ds = eng.state_diff(min(2, eng.store.latest().epoch), sort=False)
    blocks = [_ray.get(r) for r in ds.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_columns]
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "change_kind": pa.array([], pa.string()),
        }
    )
    tbl = pa.concat_tables(blocks) if blocks else empty
    return tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _q_cdc_epoch_changes(sf_dir: str):
    """Changefeed of the LATEST committed epoch: the net change per
    (conv_id, turn_idx) key in that epoch's seq window, deletes
    included — the CDC-consumer (Delta CDF) surface."""
    return _mor_engine(sf_dir).epoch_changes()


def _q_cdc_hot_keys(sf_dir: str):
    """Hot-key churn audit: top 20 conversations by valid change-event
    volume with the op mix — the skew report that tells an operator
    which keys need salting (deterministic (n DESC, conv_id) order)."""
    return _replayed_engine(sf_dir).hot_keys(top_n=20)


def _q_cdc_point_lookup(sf_dir: str):
    """Point lookup of the hot conversation ('c0', the skew key every
    stream contains): manifest-level partition pruning reads only the
    ≤salt_factor partitions the key can hash to."""
    return _replayed_engine(sf_dir).read_conversation("c0")


FORGET_IDS = ("c0", "c1")

# the exact-jaccard pair set feeds two queries (the pair list and the
# cluster fold); the signature+verify chain is the whole cost, so it is
# computed once per sf and the MATERIALIZED (deterministic) pair set is
# reused — repeat calls stay identical by construction.  Keyed on
# (path, mtime, size) of the source parquet like every other derived
# artifact (functions/filecache contract) — a path-only key would
# silently serve pairs from a regenerated corpus — and bounded (the
# per-test tmp dirs of a pytest session would otherwise accumulate).
_JACCARD_PAIRS_CACHE: dict[str, Any] = {}
_JACCARD_PAIRS_CACHE_MAX = 8

# observable cache traffic so a bench/driver can LABEL which timed call
# was served from a shared cache (a 0.0 s row without a cache marker
# reads as a miracle, not as legitimate reuse) — see bench.run_queries
_CACHE_EVENTS = {"jaccard_pairs_hits": 0, "jaccard_pairs_misses": 0}


def cache_events() -> dict[str, int]:
    """Snapshot of shared-cache hit/miss counters (monotonic)."""
    return dict(_CACHE_EVENTS)


def _jaccard_pairs_cached(sf_dir: str):
    from nifi_processors_ray.functions.filecache import source_tag

    key = source_tag(os.path.join(sf_dir, "documents.parquet"))
    ds = _JACCARD_PAIRS_CACHE.get(key)
    if ds is None:
        _CACHE_EVENTS["jaccard_pairs_misses"] += 1
        ds = _dedup.jaccard_dup_pairs(_dedup.augmented_documents(sf_dir)).materialize()
        while len(_JACCARD_PAIRS_CACHE) >= _JACCARD_PAIRS_CACHE_MAX:
            _JACCARD_PAIRS_CACHE.pop(next(iter(_JACCARD_PAIRS_CACHE)))
        _JACCARD_PAIRS_CACHE[key] = ds
    else:
        _CACHE_EVENTS["jaccard_pairs_hits"] += 1
    return ds


# erasure mutates its lake, so it gets its OWN cached engine (never the
# shared replay cache); the post-erasure state is stable — forgetting
# the same ids again is a no-op — so repeat calls stay identical
_FORGET_CACHE: dict[tuple, CdcEngine] = {}


def _q_cdc_forget(sf_dir: str):
    """Targeted erasure: replay the stream, then drive right-to-be-
    forgotten tombstones for two conversations (the hot key included)
    through the ordinary merge as one more epoch."""
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = (os.path.abspath(sf_dir), st.st_mtime_ns, st.st_size)
    eng = _FORGET_CACHE.get(key)
    if eng is None:
        eng = _fresh_engine(sf_dir)
        eng.replay()
        eng.forget_conversations(FORGET_IDS)
        _FORGET_CACHE[key] = eng
    return eng.final_state(sort=True)


def _q_cdc_replay_csv(sf_dir: str):
    """The SAME replay over a CSV re-publication of the change stream —
    the delimited-text ingest surface, checked against the identical
    SQL oracle: format must not change semantics (incl. the null-vs-
    empty-string payload distinction validate's reject route depends
    on)."""
    from nifi_processors_ray.synth import export_changelog_csv

    return _republished_engine(sf_dir, "_csv", export_changelog_csv).final_state(
        sort=True
    )


def _q_cdc_rejected(sf_dir: str):
    return _replayed_engine(sf_dir).rejected().sort("seq")


def _q_cdc_lineage_metrics(sf_dir: str):
    """Per-partition applied/rejected counts from the lineage log —
    the groupby-aggregate metrics required by the north rule.  Not
    SQL-expressible (partition = engine hash), so rows-only check."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    import pyarrow as pa

    from nifi_processors_ray.functions.debug import null_safe_groupby_agg

    eng = _replayed_engine(sf_dir)
    return null_safe_groupby_agg(
        eng.lineage(),
        "partition",
        Sum("n_applied", alias_name="applied"),
        Sum("n_rejected", alias_name="rejected"),
        Min("seq_lo", alias_name="seq_lo"),
        Max("seq_hi", alias_name="seq_hi"),
        Count(alias_name="batches"),
        out_types={
            "applied": pa.int64(),
            "rejected": pa.int64(),
            "seq_lo": pa.int64(),
            "seq_hi": pa.int64(),
            "batches": pa.int64(),
        },
    ).sort("partition")


def _q_cdc_lineage_totals(sf_dir: str):
    """Stream-wide conservation totals from the lineage log: every change
    event is either applied or rejected, exactly once.  Unlike the
    per-partition metrics (engine-hash partition ids, rows-only), these
    TOTALS are SQL-expressible from the changelog CTE, giving the
    lineage/accounting path a real driver-checked oracle."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    eng = _replayed_engine(sf_dir)
    tot = eng.lineage().aggregate(
        Sum("n_applied", alias_name="applied"), Sum("n_rejected", alias_name="rejected")
    )
    return pa.table(
        {
            "applied": pa.array([int(tot["applied"] or 0)], pa.int64()),
            "rejected": pa.array([int(tot["rejected"] or 0)], pa.int64()),
        }
    )


def _q_cdc_conversations(sf_dir: str):
    """Whole conversations in turn order, folded from the converged lake —
    the reader-facing payoff of the transcript CDC pipeline."""
    from nifi_processors_ray.pipelines.conversations import reconstruct

    eng = _replayed_engine(sf_dir)
    return reconstruct(eng.final_state()).sort("conv_id")


def _q_approx_users(sf_dir: str):
    """HyperLogLog distinct users — a mergeable sketch, not SQL-hashable
    (estimate ≠ exact once register collisions start), so rows-only;
    accuracy bounds are pinned in tests/test_sketches.py."""
    import pyarrow as pa
    import ray.data

    from nifi_processors_ray.functions.sketches import approx_distinct

    ds = ray.data.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet", columns=["user_id"])
    return pa.table({"approx_users": pa.array([approx_distinct(ds, "user_id")], pa.int64())})


def _q_approx_users_by_type(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event_type — the grouped
    HLL (register blobs merge per group through one group-key sort).
    Hash-defined output: rows-only driver check; the error-bound oracle
    lives in tests/test_sketches.py."""
    import ray.data

    from nifi_processors_ray.functions.sketches import grouped_approx_distinct
    from nifi_processors_ray.sources.reader import read_parquet_exchange

    ds = read_parquet_exchange(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return grouped_approx_distinct(ds, "event_type", "user_id")


def _q_quantile_sketch(sf_dir: str):
    """Bottom-k-sample approximate value quantiles — the mergeable
    scale path next to the exact events_value_quantiles (histogram
    exchange).  Approximate, so rows-only; the rank-error bound is
    pinned in tests/test_sketches.py."""
    import pyarrow as pa
    import ray.data

    from nifi_processors_ray.functions.sketches import approx_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir.rstrip('/')}/events.parquet", columns=["event_id", "value"]
    )
    p50, p95 = approx_quantiles(ds, "value", "event_id", qs=(0.5, 0.95))
    return pa.table(
        {"approx_p50": pa.array([p50], pa.float64()), "approx_p95": pa.array([p95], pa.float64())}
    )


def _q_heavy_users(sf_dir: str):
    """Misra-Gries approximate heavy hitters over user_id — the
    mergeable top-k scale path next to the exact events_topk_users
    (full groupby exchange).  Approximate (undercount ≤ n/(k+1)), so
    rows-only; the guarantee is pinned in tests/test_sketches.py."""
    import pyarrow as pa
    import ray.data

    from nifi_processors_ray.functions.sketches import heavy_hitters

    ds = ray.data.read_parquet(f"{sf_dir.rstrip('/')}/events.parquet", columns=["user_id"])
    keys, est = heavy_hitters(ds, "user_id", k=64)
    top = slice(0, 10)
    return pa.table(
        {
            "user_id": pa.array(keys[top].astype("int64")),
            "approx_count": pa.array(est[top], pa.int64()),
        }
    )


def _q_conversation_token_stats(sf_dir: str):
    """Lake analytics composition: converged CDC state → per-conversation
    turn/token/tool statistics (the transcripts payload analyzed by the
    text library, exactly the A+B axes pairing)."""
    from nifi_processors_ray.pipelines.conversations import token_stats

    eng = _replayed_engine(sf_dir)
    return token_stats(eng.final_state())


def _q_conversation_reply_latency(sf_dir: str):
    """Lake analytics: converged CDC state → per-conversation
    user→assistant reply-latency profile (count / total / max gap in
    integer microseconds)."""
    from nifi_processors_ray.pipelines.conversations import reply_latency

    eng = _replayed_engine(sf_dir)
    return reply_latency(eng.final_state())


def _q_conversation_turn_gaps(sf_dir: str):
    """Data-quality audit over the converged lake: conversations whose
    turn sequence has holes (deletes legitimately punch them; consumers
    check before treating a transcript as contiguous)."""
    from nifi_processors_ray.pipelines.conversations import turn_gaps

    eng = _replayed_engine(sf_dir)
    return turn_gaps(eng.final_state())


def _q_conversation_tool_profile(sf_dir: str):
    """Agentic-corpus composition report over the converged lake: per
    tool, how many tool-call turns and how many distinct conversations
    use it (the twin's COUNT(*) / COUNT(DISTINCT conv_id) split)."""
    from nifi_processors_ray.pipelines.conversations import tool_profile

    eng = _replayed_engine(sf_dir)
    return tool_profile(eng.final_state())


def _q_conversation_tool_transitions(sf_dir: str):
    """Tool-chain structure of the converged lake: (prev tool → next
    tool) step counts over each conversation's tool-call turns in turn
    order (non-tool turns skipped, matching the twin's filtered LAG)."""
    from nifi_processors_ray.pipelines.conversations import tool_transitions

    eng = _replayed_engine(sf_dir)
    return tool_transitions(eng.final_state())


def _q_conversation_daily_activity(sf_dir: str):
    """Lake freshness/volume profile: turns and distinct active
    conversations per UTC day over the converged state (exact int64
    floor-division day buckets; null ts excluded like the twin)."""
    from nifi_processors_ray.pipelines.conversations import daily_activity

    eng = _replayed_engine(sf_dir)
    return daily_activity(eng.final_state())


def _q_conv_stats_view_incremental(sf_dir: str):
    """Incremental materialized view under the driver gate: a multi-epoch
    replay folds each epoch's dirty conversations into the PARTITIONED
    ``ConvStatsView`` (clean partitions carry forward by reference, only
    dirty ones rewrite), and the converged view must equal the one-shot
    ``conversation_token_stats`` twin — the dirty-group algorithm's
    correctness proven by the same strict compare as every other query."""
    from nifi_processors_ray.pipelines.views import ConvStatsView

    # the shared multi-epoch MOR engine (~4 epochs at any sf) provides
    # the incremental folds without a private replay; the view lives
    # next to its engine's lake so the cached-engine fast path finds it
    # already at head (refresh_to_head is then a no-op)
    eng = _mor_engine(sf_dir)
    view = ConvStatsView(eng.cfg.lake_dir.rstrip("/") + "_view")
    view.refresh_to_head(eng)
    return view.read_dataset().sort("conv_id")


def _q_conversation_search(sf_dir: str):
    """Keyword retrieval over the converged lake: conversations whose
    turns mention any query term, with match counts — CDC state feeding
    a vectorized RE2 scan (the third lake-analytics composition)."""
    from nifi_processors_ray.pipelines.conversations import search

    eng = _replayed_engine(sf_dir)
    return search(eng.final_state())


SEARCH_TERMS = ("click", "purchase")


def _q_conversation_search_indexed(sf_dir: str):
    """The standing-query scale path: per-conversation hit counts served
    from the persistent inverted index (build paid once per lake,
    resumable; the query reads only the terms' hash buckets)."""
    from nifi_processors_ray.pipelines.text_index import (
        build_text_index,
        search_text_index,
    )

    eng = _replayed_engine(sf_dir)
    idx = os.path.join(eng.cfg.lake_dir, "_text_index")
    build_text_index(eng.final_state(), idx)
    return search_text_index(idx, list(SEARCH_TERMS))


def _q_conversation_dedup(sf_dir: str):
    """Transcript-level exact dedup over the converged lake (planted
    whole-conversation clones; min-id keeper per distinct transcript)."""
    from nifi_processors_ray.pipelines.conversations import dedup_conversations

    eng = _replayed_engine(sf_dir)
    return dedup_conversations(eng.final_state())


def _q_chat_training_mix(sf_dir: str):
    """Token-budgeted chat-training-mix curation over the converged lake
    (quality gate → global greedy budget fill via distributed prefix sum)."""
    from nifi_processors_ray.pipelines.conversations import chat_training_mix

    eng = _replayed_engine(sf_dir)
    return chat_training_mix(eng.final_state())


def _q_role_transitions(sf_dir: str):
    """Dialogue-structure profile of the converged lake: (prev role →
    next role) step counts in turn order across all conversations."""
    from nifi_processors_ray.pipelines.conversations import role_transitions

    eng = _replayed_engine(sf_dir)
    return role_transitions(eng.final_state())


def _conversation_search_sql() -> str:
    from nifi_processors_ray.pipelines.conversations import SEARCH_PATTERN

    hits = f"len(regexp_extract_all(coalesce(text, ''), '{SEARCH_PATTERN}'))"
    return f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, text FROM latest WHERE rn = 1 AND op <> 'D')
SELECT conv_id,
       CAST(SUM({hits}) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN {hits} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_turns_matched
FROM state
GROUP BY conv_id
HAVING SUM({hits}) > 0
ORDER BY conv_id
"""


# Driver-coverage rotation (round 5): the driver's oracle pass walks the
# queries() dict IN ORDER under a budget cap (~50 entries per round), so
# the registry is ordered for coverage, not for topic.
_REGISTRY_ORDER = (
    # round-5 rotation: the 28 queries with no driver CORRECTNESS row in
    # any of rounds 1-4 lead, so the driver's 50-query cap reaches them;
    # already-driver-green queries rotate behind (results are order-
    # independent -- every query is a pure function of sf_dir)
    "events_approx_users_by_type",
    "events_cohort_retention",
    "pricing_unpivot",
    "events_funnel",
    "customer_order_counts",
    "all_actor_ids",
    "promo_revenue_share",
    "disjunctive_band_revenue",
    "idle_rich_customers",
    "customer_spend_deciles",
    "order_size_distribution",
    "small_qty_part_revenue",
    "token_pack",
    "customer_rfm",
    "brand_revenue",
    "decontaminate",
    "ship_delay_profile",
    "large_volume_customers",
    "label_centroids",
    "shipping_priority",
    "corpus_shuffle_shards",
    "doc_chunks",
    "returned_item_revenue",
    "sole_returned_supplier",
    "nation_pair_volume",
    "local_supplier_volume",
    "events_profile",
    "nation_market_share",
    # new this round (never driver-sampled yet):
    "events_mad",
    "kmeans_clusters",
    "conversation_reply_latency",
    "cdc_state_diff",
    "conversation_turn_gaps",
    "events_trimmed_mean",
    "conversation_tool_profile",
    "conversation_tool_transitions",
    "cdc_hot_keys",
    "cdc_replay_csv",
    "conversation_daily_activity",
    # driver-green in some earlier round (union r1-r4):
    "cheapest_part_supplier",
    "priority_with_large_items",
    "nation_profit",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "brand_supplier_counts",
    "embedding_dup_pairs",
    "conv_stats_view_incremental",
    "supplier_nation_rollup",
    "events_user_enrich",
    "orders_yoy_growth",
    "events_type_share",
    "events_asof_order",
    "events_props_extract",
    "events_value_histogram",
    "events_type_pivot",
    "events_hourly_dense",
    "customer_balance_pctile",
    "quantity_band_counts",
    "orders_dow_profile",
    "top_orders_per_cust",
    "revenue_forecast",
    "events_hopping_agg",
    "events_moving_sum",
    "orders_monthly_volume",
    "events_user_outliers",
    "pricing_rollup",
    "events_first_last",
    "events_user_trend",
    "part_price_rank",
    "docs_corr",
    "events_user_gaps",
    "active_customer_ids",
    "customers_without_orders",
    "events_modal_type",
    "events_user_streaks",
    "events_median_cont",
    "latest_event_per_user",
    "customers_with_urgent_orders",
    "lineitem_pricing_summary",
    "events_hourly_retention",
    "orders_running_total",
    "pricing_cube",
    "inactive_customer_ids",
    "events_rolling_users",
    "events_type_transitions",
    "events_heavy_users",
    "customer_activity_full",
    "events_quantile_sketch",
    "events_local_density",
    "events_approx_users",
    "order_priority_revenue",
    "label_vector_sums",
    "corpus_clean",
    "training_mix",
    "cdc_rejected",
    "cdc_point_lookup",
    "events_weighted_sample",
    "events_sample",
    "cdc_forget",
    "cdc_replay_mor",
    "cdc_replay_jsonl",
    "cdc_time_travel",
    "cdc_replay",
    "events_distinct_types",
    "events_stratified_sample",
    "events_value_moments",
    "knn_brute",
    "events_conversions_within",
    "conversation_token_stats",
    "events_sessionize",
    "events_topk_users",
    "events_value_quantiles",
    "conversation_search",
    "cdc_lineage_totals",
    "media_frame_sample",
    "events_window_agg",
    "knn_range",
    "knn_ivf",
    "cdc_epoch_changes",
    "text_redact",
    "doc_fingerprint",
    "token_counts",
    "text_stats",
    "lang_id",
    "doc_repetition",
    "token_counts_csv",
    "cdc_conversations",
    "chat_training_mix",
    "conversation_role_transitions",
    "text_stats_jsonl",
    "top_ngrams",
    "conversation_search_indexed",
    "exact_dedup",
    "corpus_source_rollup",
    "conversation_dedup",
    "doc_top_terms",
    "media_features",
    "cdc_lineage_metrics",
    "simhash_dup_pairs",
    "minhash_dup_pairs",
    "dedup_clusters",
    "jaccard_dup_pairs",
    "dedup_incremental",
)


def queries() -> dict[str, Callable[[str], Any]]:
    base = _queries_by_family()
    stale = [n for n in _REGISTRY_ORDER if n not in base]
    if stale:  # renamed/removed without updating the rotation — fail loud
        raise AssertionError(f"_REGISTRY_ORDER names unknown queries: {stale}")
    ordered = {name: base.pop(name) for name in _REGISTRY_ORDER}
    if base:  # a query was added without a rotation slot — fail loud
        raise AssertionError(f"queries missing from _REGISTRY_ORDER: {sorted(base)}")
    return ordered


def _queries_by_family() -> dict[str, Callable[[str], Any]]:
    return {
        # CDC / incremental-ingest core
        "cdc_replay": _q_cdc_replay,
        "cdc_replay_mor": _q_cdc_replay_mor,
        "cdc_replay_jsonl": _q_cdc_replay_jsonl,
        "cdc_replay_csv": _q_cdc_replay_csv,
        "cdc_rejected": _q_cdc_rejected,
        "cdc_time_travel": _q_cdc_time_travel,
        "cdc_state_diff": _q_cdc_state_diff,
        "cdc_epoch_changes": _q_cdc_epoch_changes,
        "cdc_hot_keys": _q_cdc_hot_keys,
        "cdc_point_lookup": _q_cdc_point_lookup,
        "cdc_forget": _q_cdc_forget,
        "cdc_lineage_metrics": _q_cdc_lineage_metrics,
        "cdc_lineage_totals": _q_cdc_lineage_totals,
        "cdc_conversations": _q_cdc_conversations,
        "conversation_token_stats": _q_conversation_token_stats,
        # incremental view maintenance (dirty-partition folds) == twin
        "conv_stats_view_incremental": _q_conv_stats_view_incremental,
        "conversation_role_transitions": _q_role_transitions,
        "conversation_reply_latency": _q_conversation_reply_latency,
        "conversation_turn_gaps": _q_conversation_turn_gaps,
        "conversation_tool_profile": _q_conversation_tool_profile,
        "conversation_tool_transitions": _q_conversation_tool_transitions,
        "conversation_daily_activity": _q_conversation_daily_activity,
        "conversation_search": _q_conversation_search,
        "conversation_search_indexed": _q_conversation_search_indexed,
        "conversation_dedup": _q_conversation_dedup,
        "chat_training_mix": _q_chat_training_mix,
        # text analysis (documents table)
        "text_stats": _text.text_stats,
        "lang_id": _text.lang_id,
        "doc_fingerprint": _text.doc_fingerprint,
        "token_counts": _text.token_counts,
        # format surface: the SAME ops over JSONL/CSV round-trips of the
        # documents table, checked against the parquet-derived oracles
        "text_stats_jsonl": _text.text_stats_jsonl,
        "token_counts_csv": _text.token_counts_csv,
        # corpus-wide vocabulary statistic (combiner-style aggregation)
        "top_ngrams": _text.top_ngrams,
        # ReplaceText-style regex content transform
        "text_redact": _text.text_redact,
        # per-doc repetition quality signals (dup words, top bigram)
        "doc_repetition": _text.doc_repetition,
        # integer TF-IDF salient terms (2 sort exchanges, df = run length)
        "doc_top_terms": _text.doc_top_terms,
        # corpus governance accounting per (source, lang)
        "corpus_source_rollup": _text.corpus_source_rollup,
        # deduplication
        "exact_dedup": _dedup.exact_dedup,
        # incremental exact dedup: new batch vs persistent corpus index
        "dedup_incremental": _dedup.dedup_incremental,
        "minhash_dup_pairs": lambda sf: _dedup.minhash_dup_pairs(
            _dedup.augmented_documents(sf)
        ),
        "simhash_dup_pairs": lambda sf: _dedup.simhash_dup_pairs(
            _dedup.augmented_documents(sf)
        ),
        # integer pair ids only — the cosine value is a different IEEE op
        # order than the twin's list_cosine_similarity (knn_brute convention)
        "embedding_dup_pairs": lambda sf: _dedup.embedding_dup_pairs(
            _dedup.augmented_embeddings(sf)
        ).select_columns(["doc_a", "doc_b"]),
        "jaccard_dup_pairs": _jaccard_pairs_cached,
        # connected components over the verified pair graph → keep/drop;
        # reuses the cached jaccard pair set (the signature+verify chain
        # is the cost — pay it once per sf, not once per query)
        "dedup_clusters": lambda sf: _dedup.dedup_clusters(
            pairs=_jaccard_pairs_cached(sf)
        ),
        # similarity search (embeddings table)
        "knn_brute": _sim.knn_brute,
        # full-corpus distributed Lloyd's (no SQL twin: iterative; numpy
        # oracle in tests/test_ops_similarity.py)
        "kmeans_clusters": _sim.kmeans_clusters,
        "knn_ivf": _sim.knn_ivf,
        "knn_range": _sim.knn_range,
        # multimodal binary plumbing
        "media_features": _mm.media_features,
        "media_frame_sample": _mm.media_frame_sample,
        # stream analytics (events table)
        "events_window_agg": _ev.window_agg,
        "events_sessionize": _ev.sessionize,
        "events_topk_users": _ev.topk_users,
        "events_distinct_types": _ev.distinct_types,
        "events_sample": _ev.sample_events,
        # importance sampling: p ∝ value, inverse-probability weights out
        "events_weighted_sample": _ev.weighted_sample,
        # CEP temporal pattern: X then Y within a 30-minute window
        "events_conversions_within": _ev.conversions_within,
        "events_stratified_sample": _ev.stratified_sample,
        "events_value_quantiles": _ev.value_quantiles,
        "events_value_moments": _ev.value_moments,
        "events_type_share": _ev.type_share,
        "events_first_last": _ev.first_last_event,
        "events_hopping_agg": _ev.hopping_agg,
        # per-user event-type pivot (ML feature matrix)
        "events_type_pivot": _ev.type_pivot,
        # relational primitives (broadcast lookup join, wide aggregation)
        "events_user_enrich": _rel.events_user_enrich,
        "lineitem_pricing_summary": _rel.lineitem_pricing_summary,
        "events_asof_order": _rel.events_asof_order,
        "supplier_nation_rollup": _rel.supplier_nation_rollup,
        # aggregate-of-aggregate: distribution of per-order item counts
        "order_size_distribution": _rel.order_size_distribution,
        # calendar-dimension profile (integer date kernel, no dim table)
        "orders_dow_profile": _rel.orders_dow_profile,
        # RFM segmentation: 3 distributed-NTILE passes over one metric table
        "customer_rfm": _rel.customer_rfm,
        # window functions: cumulative sum, DENSE_RANK, PERCENT_RANK/CUME_DIST
        "orders_running_total": _rel.orders_running_total,
        "part_price_rank": _rel.part_price_rank,
        "customer_balance_pctile": _rel.customer_balance_pctile,
        # ROLLUP grouping sets + calendar bucketing
        "pricing_rollup": _rel.pricing_rollup,
        "orders_monthly_volume": _rel.orders_monthly_volume,
        # window-over-aggregate (YoY LAG) + grouped-stddev anomaly routing
        "orders_yoy_growth": _rel.orders_yoy_growth,
        "events_user_outliers": _rel.events_user_outliers,
        # joins beyond broadcast: co-partitioned shuffle join, top-N per
        # group, range (interval) join
        "order_priority_revenue": _joins.order_priority_revenue,
        "top_orders_per_cust": _joins.top_orders_per_cust,
        "quantity_band_counts": _joins.quantity_band_counts,
        "customers_without_orders": _joins.customers_without_orders,
        "customers_with_urgent_orders": _joins.customers_with_urgent_orders,
        # set operation (INTERSECT) + frame-bounded window functions
        "active_customer_ids": _joins.active_customer_ids,
        "events_moving_sum": _ev.moving_sum,
        # cohort retention + wide→long melt
        "events_hourly_retention": _ev.hourly_retention,
        # profiling / path analytics / gap-fill families
        "events_value_histogram": _ev.value_histogram,
        "events_type_transitions": _ev.type_transitions,
        "events_hourly_dense": _ev.hourly_dense,
        "events_profile": _prof.table_profile,
        # CORR/COVAR_POP aggregate family (sufficient-statistic partials)
        "docs_corr": _prof.docs_corr,
        "events_quantile_sketch": _q_quantile_sketch,
        "events_median_cont": _ev.median_cont,
        # grouped exact MAD off the same distinct-value histogram
        "events_mad": _ev.mad_by_type,
        "events_trimmed_mean": _ev.trimmed_mean,
        "events_heavy_users": _q_heavy_users,
        "events_user_gaps": _ev.user_gaps,
        # broadcast-aggregate self-join: ±1-minute neighborhood counts
        "events_local_density": _ev.local_density,
        # grouped linear regression from exact integer moment sums
        "events_user_trend": _ev.user_trend,
        # windowed COUNT DISTINCT (explode-to-windows, one exchange)
        "events_rolling_users": _ev.rolling_users,
        # weekly cohort retention (per-user first week from one run)
        "events_cohort_retention": _ev.cohort_retention,
        # gaps-and-islands: per-user consecutive-day activity streaks
        "events_user_streaks": _ev.user_streaks,
        # fact-to-fact join where the measure spans both sides
        "ship_delay_profile": _joins.ship_delay_profile,
        # ExtractText/RouteOnAttribute: typed regex extraction + routing
        "events_props_extract": _ev.props_extract,
        "pricing_unpivot": _rel.pricing_unpivot,
        # keep-latest-per-key upsert compaction + fact-to-dim shuffle join
        "latest_event_per_user": _ev.latest_event_per_user,
        "events_modal_type": _ev.modal_event_type,
        "brand_revenue": _joins.brand_revenue,
        # 3-table join chain (the TPC-H Q3 shape): two co-partition exchanges
        "shipping_priority": _joins.shipping_priority,
        # deep multi-hop chains (Q5/Q10 shapes, 3 resp. 2 sort exchanges)
        "local_supplier_volume": _chains.local_supplier_volume,
        "returned_item_revenue": _chains.returned_item_revenue,
        # HAVING-over-join (Q18) and pure filter-aggregate (Q6) shapes
        "large_volume_customers": _chains.large_volume_customers,
        "revenue_forecast": _rel.revenue_forecast,
        # correlated scalar subquery decorrelated into one co-located pass (Q17)
        "small_qty_part_revenue": _subq.small_qty_part_revenue,
        # EXISTS + NOT EXISTS on the same table, both resolved per run (Q21)
        "sole_returned_supplier": _subq.sole_returned_supplier,
        # global scalar subquery + anti-join + rollup (Q22)
        "idle_rich_customers": _subq.idle_rich_customers,
        # two-sided dimension tagging meeting on the orderkey (Q7)
        "nation_pair_volume": _subq.nation_pair_volume,
        # conditional aggregation over a fact-to-dim join (Q14)
        "promo_revenue_share": _subq.promo_revenue_share,
        # disjunctive predicates spanning both join sides (Q19)
        "disjunctive_band_revenue": _subq.disjunctive_band_revenue,
        # overlapping-window chunking (retrieval / context packing)
        "doc_chunks": _text.doc_chunks,
        # seeded deterministic global shuffle -> fixed-size training shards
        "corpus_shuffle_shards": _corpus.corpus_shuffle_shards,
        # share-of-total within group over a 6-table chain (Q8)
        "nation_market_share": _subq.nation_market_share,
        # remaining classic warehouse shapes (ops/warehouse.py):
        # per-group argmin join-back (Q2)
        "cheapest_part_supplier": _wh.cheapest_part_supplier,
        # EXISTS folded into a grouped count (Q4)
        "priority_with_large_items": _wh.priority_with_large_items,
        # 4-table chain grouped by (nation, ship year) (Q9)
        "nation_profit": _wh.nation_profit,
        # LEFT-JOIN count distribution incl. the zero bucket (Q13)
        "customer_order_distribution": _wh.customer_order_distribution,
        # HAVING against a global scalar — distributed argmax (Q15)
        "top_revenue_suppliers": _wh.top_revenue_suppliers,
        # COUNT DISTINCT after join with a NOT-IN exclusion (Q16)
        "brand_supplier_counts": _wh.brand_supplier_counts,
        # benchmark decontamination (broadcast eval n-gram set, pure map)
        "decontaminate": _text.decontaminate,
        # ordered conversion funnel (the self-join-free chain evaluation)
        "events_funnel": _ev.funnel,
        # NTILE deciles via the distributed global-rank (block-offset) pattern
        "customer_spend_deciles": _rel.customer_spend_deciles,
        # set-operation EXCEPT + LEFT OUTER / FULL OUTER joins (family completion)
        "inactive_customer_ids": _joins.inactive_customer_ids,
        "customer_order_counts": _joins.customer_order_counts,
        "customer_activity_full": _joins.customer_activity_full,
        "all_actor_ids": _joins.all_actor_ids,
        "pricing_cube": _rel.pricing_cube,
        "events_approx_users": _q_approx_users,
        # grouped HLL: approx distinct users per event type (sketch family)
        "events_approx_users_by_type": _q_approx_users_by_type,
        # vector aggregation (embeddings table)
        "label_vector_sums": _vec.label_vector_sums,
        "label_centroids": _vec.label_centroid_rows,
        # composed corpus-hygiene flagship (dedup → quality gate)
        "corpus_clean": _corpus.corpus_clean,
        "training_mix": _corpus.training_mix,
        # sequence packing: fixed token-budget training shards
        "token_pack": _corpus.token_pack,
    }


def oracle_sql() -> dict[str, str]:
    sql = _oracle_sql_by_family()
    # the incremental view's converged contents ARE conversation_token_stats
    # (the whole point: dirty-group folds == one-shot recompute)
    sql["conv_stats_view_incremental"] = sql["conversation_token_stats"]
    # format surfaces on the CDC path: the oracle is cdc_replay's —
    # re-publication to JSONL/CSV must not change replay semantics
    sql["cdc_replay_csv"] = sql["cdc_replay"]
    return sql


def _oracle_sql_by_family() -> dict[str, str]:
    return {
        "cdc_replay": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
""",
        # merge-on-read must converge to the IDENTICAL state
        "cdc_replay_mor": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
""",
        # hot-key churn audit: top 20 conversations by valid change volume
        # (deterministic tie-break: conv_id ASC within equal volume)
        "cdc_hot_keys": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL})
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_changes,
       CAST(COUNT(*) FILTER (op = 'I') AS BIGINT) AS n_inserts,
       CAST(COUNT(*) FILTER (op = 'U') AS BIGINT) AS n_updates,
       CAST(COUNT(*) FILTER (op = 'D') AS BIGINT) AS n_deletes
FROM valid
GROUP BY conv_id
ORDER BY n_changes DESC, conv_id
LIMIT 20
""",
        # format surface on the CDC path: identical oracle to cdc_replay
        "cdc_replay_jsonl": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
""",
        # Time travel: the state as of epoch min(2, latest) — the seq
        # cutoff is min(2·E − 1, head) with E = max(2000, n_events // 4),
        # exactly the engine's epoch-window arithmetic (wm_k = k·E − 1).
        "cdc_time_travel": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
cut AS (
  SELECT least(2 * greatest(2000, (SELECT COUNT(*) FROM events) // 4) - 1,
               (SELECT MAX(seq) FROM _ch)) AS hi
),
valid AS (
  SELECT * FROM _ch WHERE ({VALID_PREDICATE_SQL}) AND seq <= (SELECT hi FROM cut)
),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
""",
        # Snapshot diff epoch-2 -> head: same cutoff arithmetic as
        # cdc_time_travel; FULL OUTER JOIN of the two resolved states,
        # IS DISTINCT FROM on every payload column
        "cdc_state_diff": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
cut AS (
  SELECT least(2 * greatest(2000, (SELECT COUNT(*) FROM events) // 4) - 1,
               (SELECT MAX(seq) FROM _ch)) AS hi
),
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest_old AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid WHERE seq <= (SELECT hi FROM cut)
),
old_state AS (SELECT conv_id, turn_idx, role, text, tool, ts FROM latest_old WHERE rn = 1 AND op <> 'D'),
latest_new AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
new_state AS (SELECT conv_id, turn_idx, role, text, tool, ts FROM latest_new WHERE rn = 1 AND op <> 'D')
SELECT COALESCE(o.conv_id, n.conv_id) AS conv_id,
       COALESCE(o.turn_idx, n.turn_idx) AS turn_idx,
       CASE WHEN o.conv_id IS NULL THEN 'added'
            WHEN n.conv_id IS NULL THEN 'deleted'
            ELSE 'updated' END AS change_kind
FROM old_state o
FULL OUTER JOIN new_state n
  ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx
WHERE o.conv_id IS NULL OR n.conv_id IS NULL
   OR o.role IS DISTINCT FROM n.role OR o.text IS DISTINCT FROM n.text
   OR o.tool IS DISTINCT FROM n.tool OR o.ts IS DISTINCT FROM n.ts
ORDER BY conv_id, turn_idx
""",
        "cdc_point_lookup": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'D' AND conv_id = 'c0'
ORDER BY turn_idx
""",
        # Targeted erasure: converged state minus the forgotten
        # conversations (engine: tombstones through the ordinary merge)
        "cdc_forget": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest
WHERE rn = 1 AND op <> 'D'
  AND conv_id NOT IN ({", ".join(f"'{c}'" for c in FORGET_IDS)})
ORDER BY conv_id, turn_idx
""",
        # Changefeed of the LAST epoch: its window starts at the previous
        # epoch's watermark E·(head // E) − 1 (engine window arithmetic).
        "cdc_epoch_changes": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
par AS (
  SELECT greatest(2000, (SELECT COUNT(*) FROM events) // 4) AS e,
         (SELECT MAX(seq) FROM _ch) AS head
),
valid AS (
  SELECT * FROM _ch
  WHERE ({VALID_PREDICATE_SQL})
    AND seq > (SELECT e * (head // e) - 1 FROM par)
),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id, turn_idx, op, role, text, tool, ts, seq
FROM latest WHERE rn = 1
ORDER BY conv_id, turn_idx
""",
        "cdc_rejected": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE}
SELECT seq, op, conv_id, turn_idx, role, text, tool, ts, batch_id,
       CASE WHEN conv_id IS NULL THEN 'null_conv_id'
            WHEN turn_idx < 0 THEN 'bad_turn_idx'
            WHEN op <> 'D' AND text IS NULL THEN 'null_payload'
       END AS reject_reason
FROM _ch
WHERE NOT ({VALID_PREDICATE_SQL})
ORDER BY seq
""",
        # Whole-conversation reconstruction off the converged LWW state
        "cdc_conversations": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id,
       COUNT(*) AS n_turns,
       string_agg(coalesce(role, ''), chr(31) ORDER BY turn_idx) AS roles,
       string_agg(coalesce(text, ''), chr(31) ORDER BY turn_idx) AS transcript
FROM latest WHERE rn = 1 AND op <> 'D'
GROUP BY conv_id
ORDER BY conv_id
""",
        "conversation_token_stats": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CAST(len(regexp_extract_all(coalesce(text, ''),
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)) AS BIGINT) AS bpe_tokens,
       CAST(COUNT(tool) AS BIGINT) AS tool_turns
FROM latest WHERE rn = 1 AND op <> 'D'
GROUP BY conv_id
ORDER BY conv_id
""",
        "conversation_turn_gaps": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, turn_idx FROM latest WHERE rn = 1 AND op <> 'D')
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       MAX(turn_idx) AS max_turn_idx,
       CAST(MAX(turn_idx) + 1 - COUNT(*) AS BIGINT) AS n_missing
FROM state
GROUP BY conv_id
HAVING MAX(turn_idx) + 1 > COUNT(*)
ORDER BY conv_id
""",
        "conversation_reply_latency": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, turn_idx, role, ts FROM latest WHERE rn = 1 AND op <> 'D'),
steps AS (
  SELECT conv_id,
         role AS next_role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
  FROM state
)
SELECT conv_id,
       CAST(COUNT(gap_us) AS BIGINT) AS n_replies,
       CAST(SUM(gap_us) AS BIGINT) AS total_reply_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_reply_us
FROM steps
WHERE prev_role = 'user' AND next_role = 'assistant'
GROUP BY conv_id
ORDER BY conv_id
""",
        "conversation_daily_activity": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, ts FROM latest WHERE rn = 1 AND op <> 'D')
-- date_trunc is a calendar FLOOR (DuckDB's integer // truncates toward
-- zero, which would split pre-1970 days differently from the engine's
-- floor_divide); after truncation the division is an exact multiple
SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM state
WHERE ts IS NOT NULL
GROUP BY day
ORDER BY day
""",
        "conversation_tool_profile": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, tool FROM latest WHERE rn = 1 AND op <> 'D')
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM state
WHERE tool IS NOT NULL
GROUP BY tool
ORDER BY tool
""",
        "conversation_tool_transitions": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (
  SELECT conv_id, turn_idx, tool FROM latest
  WHERE rn = 1 AND op <> 'D' AND tool IS NOT NULL
),
steps AS (
  SELECT tool AS next_tool,
         LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
  FROM state
)
SELECT prev_tool, next_tool, CAST(COUNT(*) AS BIGINT) AS n
FROM steps WHERE prev_tool IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
""",
        "conversation_role_transitions": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, turn_idx, role FROM latest WHERE rn = 1 AND op <> 'D'),
steps AS (
  SELECT role AS next_role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM state
)
SELECT prev_role, next_role, CAST(COUNT(*) AS BIGINT) AS n
FROM steps WHERE prev_role IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
""",
        "conversation_search": _conversation_search_sql(),
        # transcript-level exact dedup: the aug CTE reproduces the planted
        # clones, the group key is the \x1f-folded (roles, transcript)
        "conversation_dedup": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, turn_idx, role, text FROM latest WHERE rn = 1 AND op <> 'D'),
aug AS (
  SELECT * FROM state
  UNION ALL
  SELECT conv_id || '~dup' AS conv_id, turn_idx, role, text FROM state
  WHERE CAST(substr(conv_id, 2) AS BIGINT) % 7 = 0
),
folded AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
         string_agg(coalesce(role, ''), chr(31) ORDER BY turn_idx) AS roles,
         string_agg(coalesce(text, ''), chr(31) ORDER BY turn_idx) AS transcript
  FROM aug GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id,
       CAST(MIN(n_turns) AS BIGINT) AS n_turns,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM folded
GROUP BY roles, transcript
ORDER BY conv_id
""",
        # chat training mix: token-stats gate → inclusive running window
        # sum in (tokens DESC, conv_id) order, kept while the conversation
        # STARTS under half the gated corpus' tokens
        "chat_training_mix": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
stats AS (
  SELECT conv_id,
         CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(SUM(CAST(len(regexp_extract_all(coalesce(text, ''),
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)) AS BIGINT) AS bpe_tokens,
         CAST(COUNT(tool) AS BIGINT) AS tool_turns
  FROM latest WHERE rn = 1 AND op <> 'D'
  GROUP BY conv_id
),
gated AS (SELECT * FROM stats WHERE bpe_tokens >= 60 AND tool_turns >= 1),
cum AS (
  SELECT conv_id, n_turns, bpe_tokens,
         CAST(SUM(bpe_tokens) OVER (ORDER BY bpe_tokens DESC, conv_id) AS BIGINT)
           AS cum_tokens
  FROM gated
)
SELECT conv_id, n_turns, bpe_tokens, cum_tokens
FROM cum
WHERE cum_tokens - bpe_tokens < (SELECT CAST(SUM(bpe_tokens) AS BIGINT) // 2 FROM gated)
ORDER BY conv_id
""",
        # token-exact inverted-index search: hits = occurrences of the
        # query TERMS under the repo tokenizer (lower + space split)
        "conversation_search_indexed": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE},
valid AS (SELECT * FROM _ch WHERE {VALID_PREDICATE_SQL}),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM valid
),
state AS (SELECT conv_id, text FROM latest WHERE rn = 1 AND op <> 'D'),
toks AS (
  SELECT conv_id, unnest(str_split(lower(coalesce(text, '')), ' ')) AS w FROM state
)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM toks WHERE w IN {SEARCH_TERMS!r}
GROUP BY conv_id
ORDER BY conv_id
""",
        # Conservation law: applied + rejected partitions the stream —
        # the SQL twin counts valid/invalid rows straight off the CTE.
        "cdc_lineage_totals": f"""
WITH {CHANGELOG_FROM_EVENTS_CTE}
SELECT CAST(SUM(CASE WHEN {VALID_PREDICATE_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS applied,
       CAST(SUM(CASE WHEN NOT ({VALID_PREDICATE_SQL}) THEN 1 ELSE 0 END) AS BIGINT) AS rejected
FROM _ch
""",
        # Analysis operators with exact SQL twins.  Omitted on purpose
        # (rows-only check): doc_fingerprint / minhash / simhash /
        # knn_ivf / events_approx_users — hash-, sketch- or model-defined
        # outputs SQL can't reproduce; their correctness oracles live in
        # tests/ (crafted corpora vs brute-force references).
        # jaccard_dup_pairs and embedding_dup_pairs ARE oracled: their
        # outputs are the exact verify results, and the candidate stages
        # have measured recall 1.0 on this corpus (exact copies collide
        # in every hyperplane bucket; 32×2 banding ≤1e-4 miss at j=0.5).
        "jaccard_dup_pairs": _dedup.JACCARD_DUP_PAIRS_SQL,
        "embedding_dup_pairs": _dedup.EMBEDDING_DUP_PAIRS_SQL,
        "dedup_clusters": _dedup.DEDUP_CLUSTERS_SQL,
        "top_ngrams": _text.TOP_NGRAMS_SQL,
        "text_redact": _text.TEXT_REDACT_SQL,
        "doc_repetition": _text.DOC_REPETITION_SQL,
        "doc_top_terms": _text.DOC_TOP_TERMS_SQL,
        "corpus_source_rollup": _text.SOURCE_ROLLUP_SQL,
        "part_price_rank": _rel.PART_PRICE_RANK_SQL,
        "customer_balance_pctile": _rel.BALANCE_PCTILE_SQL,
        "text_stats": _text.TEXT_STATS_SQL,
        "token_counts": _text.TOKEN_COUNTS_SQL,
        "text_stats_jsonl": _text.TEXT_STATS_SQL,
        "token_counts_csv": _text.TOKEN_COUNTS_SQL,
        "lang_id": _text.LANG_ID_SQL,
        "exact_dedup": _dedup.EXACT_DEDUP_SQL,
        "dedup_incremental": _dedup.DEDUP_INCREMENTAL_SQL,
        "knn_brute": _sim.KNN_BRUTE_SQL_TEMPLATE.format(n_queries=8, k=10),
        "knn_range": _sim.KNN_RANGE_SQL_TEMPLATE.format(
            n_queries=8, tau=_sim.KNN_RANGE_TAU
        ),
        "media_features": _mm.MEDIA_FEATURES_SQL,
        "media_frame_sample": _mm.MEDIA_FRAME_SAMPLE_SQL,
        "events_window_agg": _ev.WINDOW_AGG_SQL,
        "events_sessionize": _ev.SESSIONIZE_SQL,
        "events_topk_users": _ev.TOPK_USERS_SQL,
        "events_distinct_types": _ev.DISTINCT_TYPES_SQL,
        "events_sample": _ev.SAMPLE_SQL,
        "events_weighted_sample": _ev.WEIGHTED_SAMPLE_SQL,
        "events_conversions_within": _ev.CONVERSIONS_WITHIN_SQL,
        "events_stratified_sample": _ev.STRATIFIED_SAMPLE_SQL,
        "events_value_quantiles": _ev.VALUE_QUANTILES_SQL,
        "events_value_moments": _ev.VALUE_MOMENTS_SQL,
        "events_type_share": _ev.TYPE_SHARE_SQL,
        "events_first_last": _ev.FIRST_LAST_SQL,
        "events_hopping_agg": _ev.HOPPING_AGG_SQL,
        "events_type_pivot": _ev.TYPE_PIVOT_SQL,
        "events_user_enrich": _rel.EVENTS_USER_ENRICH_SQL,
        "lineitem_pricing_summary": _rel.LINEITEM_PRICING_SQL,
        "events_asof_order": _rel.EVENTS_ASOF_ORDER_SQL,
        "supplier_nation_rollup": _rel.SUPPLIER_NATION_ROLLUP_SQL,
        "order_size_distribution": _rel.ORDER_SIZE_DISTRIBUTION_SQL,
        "orders_dow_profile": _rel.ORDERS_DOW_PROFILE_SQL,
        "customer_rfm": _rel.CUSTOMER_RFM_SQL,
        "orders_running_total": _rel.ORDERS_RUNNING_TOTAL_SQL,
        "pricing_rollup": _rel.PRICING_ROLLUP_SQL,
        "orders_monthly_volume": _rel.ORDERS_MONTHLY_VOLUME_SQL,
        "orders_yoy_growth": _rel.ORDERS_YOY_SQL,
        "events_user_outliers": _rel.USER_OUTLIERS_SQL,
        "order_priority_revenue": _joins.ORDER_PRIORITY_REVENUE_SQL,
        "top_orders_per_cust": _joins.TOP_ORDERS_PER_CUST_SQL,
        "quantity_band_counts": _joins.QUANTITY_BAND_COUNTS_SQL,
        "customers_without_orders": _joins.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "customers_with_urgent_orders": _joins.CUSTOMERS_WITH_URGENT_ORDERS_SQL,
        "active_customer_ids": _joins.ACTIVE_CUSTOMER_IDS_SQL,
        "events_moving_sum": _ev.MOVING_SUM_SQL,
        "events_hourly_retention": _ev.RETENTION_SQL,
        "events_value_histogram": _ev.VALUE_HISTOGRAM_SQL,
        "events_type_transitions": _ev.TYPE_TRANSITIONS_SQL,
        "events_hourly_dense": _ev.HOURLY_DENSE_SQL,
        "events_profile": _prof.TABLE_PROFILE_SQL,
        "docs_corr": _prof.DOCS_CORR_SQL,
        "pricing_unpivot": _rel.PRICING_UNPIVOT_SQL,
        "latest_event_per_user": _ev.LATEST_EVENT_SQL,
        "events_modal_type": _ev.MODAL_TYPE_SQL,
        "brand_revenue": _joins.BRAND_REVENUE_SQL,
        "shipping_priority": _joins.SHIPPING_PRIORITY_SQL,
        "local_supplier_volume": _chains.LOCAL_SUPPLIER_VOLUME_SQL,
        "returned_item_revenue": _chains.RETURNED_ITEM_REVENUE_SQL,
        "large_volume_customers": _chains.LARGE_VOLUME_CUSTOMERS_SQL,
        "revenue_forecast": _rel.REVENUE_FORECAST_SQL,
        "small_qty_part_revenue": _subq.SMALL_QTY_PART_REVENUE_SQL,
        "sole_returned_supplier": _subq.SOLE_RETURNED_SUPPLIER_SQL,
        "idle_rich_customers": _subq.IDLE_RICH_CUSTOMERS_SQL,
        "nation_pair_volume": _subq.NATION_PAIR_VOLUME_SQL,
        "promo_revenue_share": _subq.PROMO_REVENUE_SHARE_SQL,
        "disjunctive_band_revenue": _subq.DISJUNCTIVE_BAND_REVENUE_SQL,
        "doc_chunks": _text.DOC_CHUNKS_SQL,
        "corpus_shuffle_shards": _corpus.SHUFFLE_SHARDS_SQL,
        "nation_market_share": _subq.NATION_MARKET_SHARE_SQL,
        "cheapest_part_supplier": _wh.CHEAPEST_PART_SUPPLIER_SQL,
        "priority_with_large_items": _wh.PRIORITY_WITH_LARGE_ITEMS_SQL,
        "nation_profit": _wh.NATION_PROFIT_SQL,
        "customer_order_distribution": _wh.CUSTOMER_ORDER_DISTRIBUTION_SQL,
        "top_revenue_suppliers": _wh.TOP_REVENUE_SUPPLIERS_SQL,
        "brand_supplier_counts": _wh.BRAND_SUPPLIER_COUNTS_SQL,
        "decontaminate": _text.DECONTAMINATE_SQL,
        "events_funnel": _ev.FUNNEL_SQL,
        "customer_spend_deciles": _rel.SPEND_DECILES_SQL,
        "inactive_customer_ids": _joins.INACTIVE_CUSTOMER_IDS_SQL,
        "customer_order_counts": _joins.CUSTOMER_ORDER_COUNTS_SQL,
        "customer_activity_full": _joins.CUSTOMER_ACTIVITY_FULL_SQL,
        "all_actor_ids": _joins.ALL_ACTOR_IDS_SQL,
        "pricing_cube": _rel.PRICING_CUBE_SQL,
        "events_median_cont": _ev.MEDIAN_CONT_SQL,
        "events_mad": _ev.MAD_SQL,
        "events_trimmed_mean": _ev.TRIMMED_MEAN_SQL,
        "events_user_gaps": _ev.USER_GAPS_SQL,
        "events_local_density": _ev.LOCAL_DENSITY_SQL,
        "events_user_trend": _ev.USER_TREND_SQL,
        "events_rolling_users": _ev.ROLLING_USERS_SQL,
        "events_cohort_retention": _ev.COHORT_RETENTION_SQL,
        "events_user_streaks": _ev.USER_STREAKS_SQL,
        "ship_delay_profile": _joins.SHIP_DELAY_PROFILE_SQL,
        "events_props_extract": _ev.PROPS_EXTRACT_SQL,
        "label_vector_sums": _vec.LABEL_VECTOR_SUMS_SQL,
        "label_centroids": _vec.LABEL_CENTROIDS_SQL,
        "corpus_clean": _corpus.CORPUS_CLEAN_SQL,
        "training_mix": _corpus.TRAINING_MIX_SQL,
        "token_pack": _corpus.TOKEN_PACK_SQL,
    }
