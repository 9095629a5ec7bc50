"""Conversation reconstruction — the consumer-facing payoff of the
transcript lake.

The whole point of replaying the change stream into a converged lake
(``consumer/GetKinesisStream.java`` per-shard ordered delivery →
``pipelines/replay.py`` LWW lake) is that a reader can ask for WHOLE
conversations in turn order.  This operator folds the lake's
``(conv_id, turn_idx)`` rows into one row per conversation:

    conv_id, n_turns, roles (unit-separated), transcript (unit-separated)

Shape: ONE sort exchange on the group key (``conv_id`` alone — Ray
sort co-location covers full-tuple runs only), then a block-local
vectorized fold: per-run ordering via ``Table.sort_by``, per-run string
concatenation via ``pc.binary_join`` over a ListArray built straight
from the run offsets — no per-conversation Python strings.

The separator is ASCII unit separator (0x1F), which the synthetic text
corpus can never contain (printable ASCII words), making the fold
reversible and the SQL twin (``string_agg(..., chr(31) ORDER BY
turn_idx)``) exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.debug import checked_sort, null_safe_groupby_agg, null_safe_sort

SEP = "\x1f"


def fold_conversations_block(block: pa.Table) -> pa.Table:
    """One co-located block of transcript rows → one row per conv_id."""
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "roles": pa.array([], pa.string()),
            "transcript": pa.array([], pa.string()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    b = block.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = b.column("conv_id").combine_chunks()
    codes = np.asarray(conv.dictionary_encode().indices)
    new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
    starts = np.nonzero(new_run)[0]
    offsets = pa.array(np.concatenate([starts, [n]]).astype(np.int32))

    def join(col_name: str) -> pa.Array:
        vals = pc.fill_null(b.column(col_name).combine_chunks(), "")
        return pc.binary_join(pa.ListArray.from_arrays(offsets, vals), SEP)

    return pa.table(
        {
            "conv_id": conv.take(pa.array(starts)),
            "n_turns": pa.array(np.diff(np.concatenate([starts, [n]])).astype(np.int64)),
            "roles": join("role"),
            "transcript": join("text"),
        }
    )


def reconstruct(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Fold a transcript-shaped Dataset (conv_id, turn_idx, role, text,
    ...) into one ordered row per conversation."""
    ds = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    return checked_sort(ds, "conv_id").map_batches(
        fold_conversations_block, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# lake analytics: per-conversation token/turn statistics
# ---------------------------------------------------------------------------


def token_stats_block(batch: pa.Table) -> pa.Table:
    """Per-batch (conv_id → turns, BPE tokens, tool turns) partials —
    the combiner: each batch collapses to ≤ distinct-convs rows before
    the shuffle, and tokenization runs once, in Arrow's RE2 kernel."""
    from ..ops.text import BPE_ISH_PATTERN

    text = pc.fill_null(batch.column("text"), "")
    toks = pc.count_substring_regex(text, BPE_ISH_PATTERN).cast(pa.int64())
    t = pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "toks": toks,
            # COUNT(tool) semantics: 1 where tool is non-null
            "tool_flag": pc.is_valid(batch.column("tool")).cast(pa.int64()),
        }
    )
    g = t.group_by(["conv_id"]).aggregate(
        [("toks", "sum"), ("tool_flag", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "conv_id": g.column("conv_id"),
            "n_turns": g.column("count_all"),
            "bpe_tokens": g.column("toks_sum"),
            "tool_turns": g.column("tool_flag_sum"),
        }
    )


def token_stats(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation size statistics over the CONVERGED lake — the
    composition the engine exists for: CDC replay (exactly-once LWW
    state) feeding the text-analysis library.  Turn counts, BPE-ish
    token totals and tool-call turns per conversation; partials bound
    the exchange by distinct conversations per batch, never rows."""
    from ray.data.aggregate import Sum

    return (
        transcripts.map_batches(token_stats_block, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("bpe_tokens", alias_name="bpe_tokens"),
            Sum("tool_turns", alias_name="tool_turns"),
        )
        .sort("conv_id")
    )


# ---------------------------------------------------------------------------
# lake analytics: turn-index gap audit (data-quality surface)
# ---------------------------------------------------------------------------


def _turn_gaps_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (conv_id → count, max turn_idx) partials — the combiner
    bounds the exchange by distinct conversations per batch."""
    t = pa.table(
        {"conv_id": batch.column("conv_id"), "turn_idx": batch.column("turn_idx")}
    )
    g = t.group_by(["conv_id"]).aggregate([("turn_idx", "max"), ([], "count_all")])
    return pa.table(
        {
            "conv_id": g.column("conv_id"),
            "mx": g.column("turn_idx_max"),
            "n": g.column("count_all"),
        }
    )


def turn_gaps(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Conversations whose turn sequence has holes: ``max(turn_idx)+1 >
    count`` under the lake invariant that (conv_id, turn_idx) is unique
    — the audit a consumer runs before treating a transcript as a
    contiguous dialogue (deletes legitimately punch holes; this surfaces
    them).  Partial (count, max) per batch, one small exchange, the gap
    arithmetic on the merged aggregates."""
    from ray.data.aggregate import Max, Sum

    cols = transcripts.select_columns(["conv_id", "turn_idx"])
    agg = null_safe_groupby_agg(
        cols.map_batches(_turn_gaps_partial, batch_format="pyarrow"),
        "conv_id",
        Sum("n", alias_name="n_turns"),
        Max("mx", alias_name="max_turn_idx"),
        out_types={"n_turns": pa.int64(), "max_turn_idx": pa.int32()},
    )

    def finish(b: pa.Table) -> pa.Table:
        missing = pc.subtract(
            pc.add(b.column("max_turn_idx").cast(pa.int64()), 1), b.column("n_turns")
        )
        out = pa.table(
            {
                "conv_id": b.column("conv_id"),
                "n_turns": b.column("n_turns"),
                "max_turn_idx": b.column("max_turn_idx"),
                "n_missing": missing,
            }
        )
        return out.filter(pc.greater(missing, 0))

    return null_safe_sort(
        agg.map_batches(finish, batch_format="pyarrow"), "conv_id"
    )


# ---------------------------------------------------------------------------
# lake analytics: role-transition structure of conversations
# ---------------------------------------------------------------------------


def role_transitions_block(block: pa.Table) -> pa.Table:
    """Per co-located conversation run: (prev role → role) step counts
    in turn order — the shared lag-transitions kernel keyed to
    (conv_id, turn_idx) (see ``functions.blocks.transition_pairs_block``
    for the null-group / null-prev contract)."""
    from ..functions.blocks import transition_pairs_block

    out = transition_pairs_block(block, "conv_id", ["turn_idx"], "role")
    return out.rename_columns(["prev_role", "next_role", "n"])


def role_transitions(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """First-order role-transition counts over the converged lake —
    which role follows which across every conversation's turn order
    (the dialogue-structure profile of a transcript corpus).  ONE sort
    exchange on conv_id; order, shift and collapse are block-local."""
    from ray.data.aggregate import Sum

    cols = transcripts.select_columns(["conv_id", "turn_idx", "role"])
    partials = checked_sort(cols, "conv_id").map_batches(
        role_transitions_block, batch_format="pyarrow", batch_size=None
    )
    agg = null_safe_groupby_agg(
        partials, ["prev_role", "next_role"], Sum("n", alias_name="n"),
        out_types={"n": pa.int64()},
    )
    return null_safe_sort(agg, ["prev_role", "next_role"])


# ---------------------------------------------------------------------------
# lake analytics: tool-usage profile of the converged lake
# ---------------------------------------------------------------------------


def _tool_profile_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (tool, conv_id → calls) partials over tool-call turns —
    the combiner bounds the exchange by distinct (tool, conv) pairs per
    batch, never rows.  Null ``tool`` is 'no tool call' and dropped
    here, mirroring the twin's ``WHERE tool IS NOT NULL``."""
    b = batch.filter(pc.is_valid(batch.column("tool")))
    g = (
        pa.table({"tool": b.column("tool"), "conv_id": b.column("conv_id")})
        .group_by(["tool", "conv_id"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "tool": g.column("tool"),
            "conv_id": g.column("conv_id"),
            "n": g.column("count_all"),
        }
    )


def _tool_profile_finish_partial(b: pa.Table) -> pa.Table:
    """(tool, conv_id, calls) — globally unique pairs after the first
    exchange — folded to per-tool partials.  ``n_convs`` counts pairs
    with a NON-null conv_id (SQL ``COUNT(DISTINCT conv_id)`` skips
    nulls); ``n_calls`` keeps every call (``COUNT(*)``)."""
    g = (
        pa.table(
            {
                "tool": b.column("tool"),
                "n": b.column("n"),
                "conv_flag": pc.is_valid(b.column("conv_id")).cast(pa.int64()),
            }
        )
        .group_by(["tool"])
        .aggregate([("n", "sum"), ("conv_flag", "sum")])
    )
    return pa.table(
        {
            "tool": g.column("tool"),
            "n_calls": g.column("n_sum"),
            "n_convs": g.column("conv_flag_sum"),
        }
    )


def tool_profile(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-tool usage over the converged lake: how many tool-call turns
    each tool has (``n_calls``) and how many distinct conversations use
    it (``n_convs``) — the agentic-corpus composition report.

    Exchange discipline: batches collapse to (tool, conv) pair partials
    before the first shuffle (the only row-bounded one), the pair
    aggregate collapses block-locally to per-tool partials, and the
    second exchange carries ≤ |tools| × blocks rows.  Because the synth
    stream's prefix predates the ``tool`` column, this query also
    exercises schema-evolution unification on the read path."""
    from ray.data.aggregate import Sum

    cols = transcripts.select_columns(["conv_id", "tool"])
    pairs = null_safe_groupby_agg(
        cols.map_batches(_tool_profile_partial, batch_format="pyarrow"),
        ["tool", "conv_id"],
        Sum("n", alias_name="n"),
        out_types={"n": pa.int64()},
    )
    agg = null_safe_groupby_agg(
        pairs.map_batches(_tool_profile_finish_partial, batch_format="pyarrow"),
        "tool",
        Sum("n_calls", alias_name="n_calls"),
        Sum("n_convs", alias_name="n_convs"),
        out_types={"n_calls": pa.int64(), "n_convs": pa.int64()},
    )
    return null_safe_sort(agg, "tool")


# ---------------------------------------------------------------------------
# lake analytics: daily activity profile of the converged lake
# ---------------------------------------------------------------------------

US_PER_DAY = 86_400_000_000


def _daily_activity_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (day, conv_id → turns) partials — the combiner bounds
    the exchange by distinct (day, conv) pairs per batch.  Null ts has
    no day and is dropped, mirroring the twin's ``WHERE ts IS NOT
    NULL``; the day is integer floor division of epoch-µs (exact — no
    double rounding at day boundaries), matching the twin's ``//``."""
    b = batch.filter(pc.is_valid(batch.column("ts")))
    # exact int64 floor division (toward -inf, so pre-1970 epochs land
    # on the correct day) — matches the twin's BIGINT // BIGINT
    us = np.asarray(b.column("ts").combine_chunks().cast(pa.int64()))
    day = pa.array(np.floor_divide(us, US_PER_DAY), pa.int64())
    g = (
        pa.table({"day": day, "conv_id": b.column("conv_id")})
        .group_by(["day", "conv_id"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "day": g.column("day"),
            "conv_id": g.column("conv_id"),
            "n": g.column("count_all"),
        }
    )


def _daily_activity_finish_partial(b: pa.Table) -> pa.Table:
    """Globally-unique (day, conv, turns) rows folded to per-day
    partials: turn totals keep every row, the conversation count skips
    null conv_ids (``COUNT(DISTINCT conv_id)`` semantics)."""
    g = (
        pa.table(
            {
                "day": b.column("day"),
                "n": b.column("n"),
                "conv_flag": pc.is_valid(b.column("conv_id")).cast(pa.int64()),
            }
        )
        .group_by(["day"])
        .aggregate([("n", "sum"), ("conv_flag", "sum")])
    )
    return pa.table(
        {
            "day": g.column("day"),
            "n_turns": g.column("n_sum"),
            "n_convs": g.column("conv_flag_sum"),
        }
    )


def daily_activity(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Lake freshness/volume profile: turns and distinct active
    conversations per UTC day over the converged state — the calendar
    rollup an operator reads next to the churn audit.  Same exchange
    discipline as :func:`tool_profile`: (day, conv) pair partials bound
    the one row-scale shuffle; the per-day fold is partial-combined."""
    from ray.data.aggregate import Sum

    cols = transcripts.select_columns(["conv_id", "ts"])
    pairs = null_safe_groupby_agg(
        cols.map_batches(_daily_activity_partial, batch_format="pyarrow"),
        ["day", "conv_id"],
        Sum("n", alias_name="n"),
        out_types={"n": pa.int64()},
    )
    agg = null_safe_groupby_agg(
        pairs.map_batches(_daily_activity_finish_partial, batch_format="pyarrow"),
        "day",
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_convs", alias_name="n_convs"),
        out_types={"n_turns": pa.int64(), "n_convs": pa.int64()},
    )
    return null_safe_sort(agg, "day")


# ---------------------------------------------------------------------------
# lake analytics: tool-chain structure (which tool follows which)
# ---------------------------------------------------------------------------


def tool_transitions_block(block: pa.Table) -> pa.Table:
    """Per co-located conversation run: (prev tool → tool) step counts
    over the conversation's TOOL-CALL turns in turn order — the shared
    lag-transitions kernel on the tool column after the null filter."""
    from ..functions.blocks import transition_pairs_block

    out = transition_pairs_block(block, "conv_id", ["turn_idx"], "tool")
    return out.rename_columns(["prev_tool", "next_tool", "n"])


def tool_transitions(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """First-order tool-transition counts over the converged lake —
    which tool follows which within a conversation's sequence of tool
    calls (non-tool turns skipped, matching the twin's filtered LAG).
    The null filter runs BEFORE the sort exchange so only tool-call
    turns — a fraction of the lake — are shuffled."""
    from ray.data.aggregate import Sum

    cols = transcripts.select_columns(["conv_id", "turn_idx", "tool"])

    def drop_non_tool(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("tool")))

    partials = checked_sort(
        cols.map_batches(drop_non_tool, batch_format="pyarrow"), "conv_id"
    ).map_batches(tool_transitions_block, batch_format="pyarrow", batch_size=None)
    agg = null_safe_groupby_agg(
        partials, ["prev_tool", "next_tool"], Sum("n", alias_name="n"),
        out_types={"n": pa.int64()},
    )
    return null_safe_sort(agg, ["prev_tool", "next_tool"])


# ---------------------------------------------------------------------------
# lake analytics: user→assistant reply latency per conversation
# ---------------------------------------------------------------------------


def reply_latency_block(block: pa.Table) -> pa.Table:
    """Per co-located conversation run: reply-latency aggregates over the
    user→assistant turn steps, in turn order.

    Mirrors the twin's semantics exactly: a step row exists for every
    consecutive (turn_idx-ordered) pair inside a conversation; only
    steps with prev role 'user' and next role 'assistant' qualify;
    ``n_replies`` counts steps whose gap is non-null (either ts null →
    gap null, the step still qualifies), sum/max skip null gaps (all
    null → NULL), and a conversation emits a row iff it has ≥1
    qualifying step."""
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_replies": pa.array([], pa.int64()),
            "total_reply_us": pa.array([], pa.int64()),
            "max_reply_us": pa.array([], pa.int64()),
        }
    )
    if block.num_rows == 0:
        return empty
    b = block.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = np.asarray(b.column("conv_id").combine_chunks().dictionary_encode().indices)
    role = b.column("role").combine_chunks()
    ts = np.asarray(
        b.column("ts").combine_chunks().cast(pa.int64()), dtype=np.float64
    )  # null → NaN
    is_user = np.asarray(pc.fill_null(pc.equal(role, "user"), False))
    is_asst = np.asarray(pc.fill_null(pc.equal(role, "assistant"), False))
    step = (conv[1:] == conv[:-1]) & is_user[:-1] & is_asst[1:]
    if not step.any():
        return empty
    idx = np.nonzero(step)[0]  # step i: rows i (prev) and i+1 (next)
    gap = ts[idx + 1] - ts[idx]  # NaN if either ts null
    code = conv[idx + 1]
    uniq, inv = np.unique(code, return_inverse=True)
    has_gap = ~np.isnan(gap)
    n_replies = np.bincount(inv, weights=has_gap, minlength=len(uniq)).astype(np.int64)
    total = np.bincount(inv, weights=np.where(has_gap, gap, 0.0), minlength=len(uniq))
    mx = np.full(len(uniq), -np.inf)
    np.maximum.at(mx, inv[has_gap], gap[has_gap])
    conv_ids = b.column("conv_id").take(pa.array(idx[np.unique(inv, return_index=True)[1]] + 1))
    any_gap = n_replies > 0
    # integer microsecond gaps: float64 is exact up to 2^53 us (~285 yr)
    return pa.table(
        {
            "conv_id": conv_ids,
            "n_replies": pa.array(n_replies),
            "total_reply_us": pa.array(
                [int(t) if g else None for t, g in zip(total, any_gap)], pa.int64()
            ),
            "max_reply_us": pa.array(
                [int(m) if g else None for m, g in zip(mx, any_gap)], pa.int64()
            ),
        }
    )


def reply_latency(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation user→assistant reply-latency profile over the
    converged lake (count / total / max gap in integer microseconds) —
    the latency view an agent-quality dashboard reads.  ONE sort
    exchange on conv_id; turn ordering, step pairing and the aggregate
    are block-local (full-conv runs are co-located by ``checked_sort``'s
    run-repair)."""
    cols = transcripts.select_columns(["conv_id", "turn_idx", "role", "ts"])
    out = checked_sort(cols, "conv_id").map_batches(
        reply_latency_block, batch_format="pyarrow", batch_size=None
    )
    return null_safe_sort(out, "conv_id")


# ---------------------------------------------------------------------------
# lake analytics: transcript-level exact dedup (whole-conversation copies)
# ---------------------------------------------------------------------------

# The synthetic stream never produces two identical conversations, so the
# query plants deterministic clones (conv numeric suffix % CLONE_MOD == 0
# → a '~dup' twin); detection itself is blind to the planting, exactly
# like ops.dedup.augmented_documents.
CLONE_MOD = 7
CLONE_SUFFIX = "~dup"

# roles and transcript are \x1f-joined; \x1e (record separator) can never
# appear in either, so the composite key is collision-free by construction
_KEY_SEP = "\x1e"


def _clone_block(b: pa.Table) -> pa.Table:
    """Deterministic whole-conversation clones of every CLONE_MOD-th
    conversation (by numeric id suffix), under a '~dup' id."""
    conv = b.column("conv_id").combine_chunks()
    num = np.asarray(pc.cast(pc.utf8_slice_codeunits(conv, 1), pa.int64()))
    sub = b.filter(pa.array(num % CLONE_MOD == 0))
    new_id = pc.binary_join_element_wise(
        sub.column("conv_id").combine_chunks(), CLONE_SUFFIX.lstrip("~"), "~"
    )
    return sub.set_column(sub.schema.get_field_index("conv_id"), "conv_id", new_id)


def _add_conv_key_hash(b: pa.Table) -> pa.Table:
    from ..functions.hashing import hash_strings_u64

    key = pc.binary_join_element_wise(
        b.column("roles").combine_chunks(), b.column("transcript").combine_chunks(), _KEY_SEP
    )
    return b.append_column("__key", key).append_column(
        "__h", pa.array(hash_strings_u64(key).astype(np.int64))
    )


def _conv_dedup_block(block: pa.Table) -> pa.Table:
    """Per co-located hash block: group runs of EQUAL (roles, transcript)
    keys (real string equality — a hash collision can never merge two
    distinct conversations), keep the min-conv_id copy with a count."""
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "n_copies": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    b = block.sort_by([("__key", "ascending"), ("conv_id", "ascending")])
    codes = np.asarray(b.column("__key").combine_chunks().dictionary_encode().indices)
    new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
    starts = np.nonzero(new_run)[0]
    take = pa.array(starts)
    return pa.table(
        {
            "conv_id": b.column("conv_id").combine_chunks().take(take),
            "n_turns": b.column("n_turns").combine_chunks().take(take).cast(pa.int64()),
            "n_copies": pa.array(
                np.diff(np.concatenate([starts, [n]])).astype(np.int64)
            ),
        }
    )


def dedup_conversations(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Exact whole-conversation dedup over the converged lake: fold each
    conversation to its ordered (roles, transcript) identity, shuffle the
    64-bit key hash (the transcript text never sorts), keep the
    min-conv_id copy per distinct conversation with a copy count.

    The transcript-corpus hygiene primitive: retraining on a lake where
    whole sessions were re-ingested under new ids must not double-count
    them.  Scale shape: ONE hash exchange whose payload is the folded
    conversations (same order as the corpus), plus the reconstruct fold's
    conv_id sort."""
    aug = transcripts.union(
        transcripts.map_batches(_clone_block, batch_format="pyarrow")
    )
    folded = reconstruct(aug)
    keyed = folded.map_batches(_add_conv_key_hash, batch_format="pyarrow")
    out = checked_sort(keyed, "__h").map_batches(
        _conv_dedup_block, batch_format="pyarrow", batch_size=None
    )
    return out.sort("conv_id")


# ---------------------------------------------------------------------------
# chat training mix: quality gate → global token-budget fill
# ---------------------------------------------------------------------------

MIX_MIN_TOKENS = 60  # conversations below this are too thin to train on
MIX_MIN_TOOL_TURNS = 1  # agentic-data gate: must contain a tool call


def chat_training_mix(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Curate a token-budgeted chat-training mix from the converged lake:
    per-conversation token stats → quality gate (min tokens, ≥1 tool
    turn) → conversations in (tokens DESC, conv_id) order greedily fill
    HALF the gated corpus' token budget (a conversation is kept iff it
    STARTS under the budget).

    The transcripts twin of ``pipelines.corpus.training_mix``: the same
    distributed prefix-sum shape (sort → materialize → metadata-only
    block-offset pass → vectorized assign), fed by the CDC-replayed lake
    instead of a static corpus.  The budget is derived from the gated
    corpus itself (Σtokens // 2) so the query is scale-free."""
    from ..functions.blocks import block_offset_index

    stats = token_stats(transcripts)

    def gate(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("bpe_tokens"), pa.scalar(MIX_MIN_TOKENS, pa.int64())),
            pc.greater_equal(
                b.column("tool_turns"), pa.scalar(MIX_MIN_TOOL_TURNS, pa.int64())
            ),
        )
        t = b.filter(keep)
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "n_turns": t.column("n_turns"),
                "bpe_tokens": t.column("bpe_tokens"),
                "neg_tokens": pc.negate_checked(t.column("bpe_tokens").combine_chunks()),
            }
        )

    empty = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("bpe_tokens", pa.int64()),
            ("cum_tokens", pa.int64()),
        ]
    )
    # materialized once: the budget aggregate and the ordered fill both
    # consume it (per-conversation stats, orders of magnitude smaller
    # than the corpus)
    gated = stats.map_batches(gate, batch_format="pyarrow").materialize()
    total = gated.sum("bpe_tokens")
    if total is None:
        # pa.Table, not a Dataset: Ray's to_pandas() on a 0-row dataset
        # drops the column schema entirely
        return empty.empty_table()
    budget = int(total) // 2

    ordered = gated.sort(["neg_tokens", "conv_id"]).materialize()
    offset_by_key, _ = block_offset_index(
        ordered,
        ["neg_tokens", "conv_id"],
        lambda b: pc.sum(b.column("bpe_tokens")).as_py(),
    )

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty.empty_table()
        key = (b.column("neg_tokens")[0].as_py(), b.column("conv_id")[0].as_py())
        off = offset_by_key[key]  # KeyError = split drift: fail loud
        tok = np.asarray(b.column("bpe_tokens"))
        excl = off + np.cumsum(tok, dtype=np.int64) - tok
        out = pa.table(
            {
                "conv_id": b.column("conv_id"),
                "n_turns": b.column("n_turns"),
                "bpe_tokens": b.column("bpe_tokens"),
                "cum_tokens": pa.array(excl + tok),
            }
        )
        return out.filter(pa.array(excl < budget))

    out = ordered.map_batches(assign, batch_format="pyarrow", batch_size=None)
    from ..functions.blocks import compact_small_result

    return compact_small_result(out, empty).sort("conv_id")


# ---------------------------------------------------------------------------
# lake analytics: keyword search over the converged state
# ---------------------------------------------------------------------------

# Query terms as one RE2 alternation — compiled ONCE in Arrow's C++
# kernel, never per batch or per row.  The synthetic transcripts embed
# the originating event type in each turn's text, so these terms hit.
SEARCH_PATTERN = "click|purchase"


def search_block(batch: pa.Table) -> pa.Table:
    """Per-batch (conv_id → match count, matched-turn count) partials
    for the keyword search — one vectorized RE2 count per batch."""
    text = pc.fill_null(batch.column("text"), "")
    hits = pc.count_substring_regex(text, SEARCH_PATTERN).cast(pa.int64())
    t = pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "hits": hits,
            "turn_hit": pc.greater(hits, 0).cast(pa.int64()),
        }
    )
    g = t.group_by(["conv_id"]).aggregate([("hits", "sum"), ("turn_hit", "sum")])
    return pa.table(
        {
            "conv_id": g.column("conv_id"),
            "n_hits": g.column("hits_sum"),
            "n_turns_matched": g.column("turn_hit_sum"),
        }
    )


def search(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Keyword search over the CONVERGED lake: conversations mentioning
    any query term, with total match and matched-turn counts — the
    retrieval composition (CDC replay feeding a text scan).  Per-batch
    regex-count partials bound the exchange by distinct conversations;
    non-matching conversations are dropped AFTER the fold (a HAVING,
    not a scan filter, so partial sums stay correct)."""
    from ray.data.aggregate import Sum

    agg = (
        transcripts.map_batches(search_block, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_hits", alias_name="n_hits"),
            Sum("n_turns_matched", alias_name="n_turns_matched"),
        )
    )
    return agg.filter(expr="n_hits > 0").sort("conv_id")
