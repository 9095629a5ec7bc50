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
