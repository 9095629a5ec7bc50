"""Composed corpus-hygiene pipeline: dedup → quality gate.

The end-to-end "clean the training corpus" flow a data engine exists
for, built by composing the operator library: exact dedup (first doc
per text) feeding a vectorized quality filter (token count + stopword
ratio).  One shuffle total (the dedup hash co-location) — the quality
stage is a stateless filter fused onto it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.reader import read_parquet_fanout as read_parquet_clean

from ..functions.debug import checked_sort
from ..ops.dedup import EXACT_DEDUP_SQL, _add_text_hash, _first_per_text
from ..ops.text import BPE_ISH_PATTERN, STOPWORDS, _per_list_sum, _token_lists

MIN_TOKENS = 20
MAX_STOPWORD_RATIO = 0.5

# ORDER-BY-free body, composable as a CTE (training_mix reuses it)
CORPUS_CLEAN_BODY = f"""
WITH deduped AS (
  SELECT doc_id, text, lang, source, n_chars
  FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
  )
  WHERE rn = 1
),
scored AS (
  SELECT *, len(str_split(text, ' ')) AS n_tokens,
         len(list_filter(str_split(text, ' '), x -> x IN {STOPWORDS!r})) AS stop_count
  FROM deduped
)
SELECT doc_id, text, lang, source, n_chars, n_tokens
FROM scored
WHERE n_tokens >= {MIN_TOKENS}
  AND CAST(stop_count AS DOUBLE) / n_tokens <= {MAX_STOPWORD_RATIO}
"""

CORPUS_CLEAN_SQL = CORPUS_CLEAN_BODY + "ORDER BY doc_id\n"


def _quality_filter(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    text = pc.fill_null(batch.column("text"), "")
    n_tokens = (pc.count_substring(text, " ").to_numpy(zero_copy_only=False) + 1).astype(
        np.int64
    )
    values, offsets = _token_lists(text)
    is_stop = pc.is_in(values, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    stop_count = _per_list_sum(is_stop.astype(np.int64), offsets)
    keep = (n_tokens >= MIN_TOKENS) & (
        stop_count.astype(np.float64) / n_tokens <= MAX_STOPWORD_RATIO
    )
    return batch.append_column("n_tokens", pa.array(n_tokens)).filter(pa.array(keep))


def corpus_clean(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    ds = read_parquet_clean(f"{sf_dir.rstrip('/')}/documents.parquet")
    out = (
        checked_sort(ds.map_batches(_add_text_hash, batch_format="pyarrow"), "__h")
        .map_batches(_first_per_text, batch_format="pyarrow", batch_size=None)
        .map_batches(_quality_filter, batch_format="pyarrow")
    )
    # trailing sort is determinism-only (see SURVEY §2.5 sort=False note)
    return out.sort("doc_id") if sort else out


# ---------------------------------------------------------------------------
# training-mix curation: dedup → quality → language → per-language token budget
# ---------------------------------------------------------------------------

TOKENS_PER_LANG = 5_000


def _build_training_mix_sql() -> str:
    from ..ops.text import LANG_ID_BODY

    # compose the ORDER-BY-free twin bodies as CTEs (no string surgery)
    return f"""
WITH clean AS ({CORPUS_CLEAN_BODY}),
lang AS ({LANG_ID_BODY}),
j AS (
  SELECT c.doc_id, c.n_tokens, l.lang_pred
  FROM clean c JOIN lang l USING (doc_id)
),
cum AS (
  SELECT *, CAST(SUM(n_tokens) OVER (
              PARTITION BY lang_pred ORDER BY doc_id
            ) AS BIGINT) AS cum_tokens
  FROM j
)
SELECT doc_id, lang_pred, n_tokens, cum_tokens
FROM cum
WHERE cum_tokens - n_tokens < {TOKENS_PER_LANG}
ORDER BY doc_id
"""


TRAINING_MIX_SQL = _build_training_mix_sql()


def _budget_block(block: pa.Table, budget: int) -> pa.Table:
    """Per co-located language run: order by doc_id, running token sum,
    keep docs that START under the budget (greedy fill) — vectorized via
    one cumsum with run-start offsets subtracted."""
    n = block.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang_pred": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "cum_tokens": pa.array([], pa.int64()),
            }
        )
    b = block.sort_by([("lang_pred", "ascending"), ("doc_id", "ascending")])
    lang = np.asarray(b.column("lang_pred").combine_chunks().dictionary_encode().indices)
    toks = np.asarray(b.column("n_tokens"))
    new_run = np.concatenate([[True], lang[1:] != lang[:-1]])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.concatenate([starts, [n]]))
    cs = np.cumsum(toks, dtype=np.int64)
    base = np.repeat(np.concatenate([[0], cs[starts[1:] - 1]]) if len(starts) > 1 else [0], run_len)
    cum = cs - base  # running per-language total INCLUDING this doc
    keep = (cum - toks) < budget
    out = b.filter(pa.array(keep))
    return pa.table(
        {
            "doc_id": out.column("doc_id"),
            "lang_pred": out.column("lang_pred"),
            "n_tokens": out.column("n_tokens"),
            "cum_tokens": pa.array(cum[keep]),
        }
    )


def training_mix(
    sf_dir: str, *, tokens_per_lang: int = TOKENS_PER_LANG, sort: bool = True
) -> ray.data.Dataset:
    """Curate a per-language token-budgeted training mix: exact dedup →
    quality gate → language ID (all fused map stages) → ONE sort on the
    language key → vectorized greedy budget fill per language (docs in
    doc_id order fill each language's quota; a doc is kept iff it STARTS
    under the budget).

    The composed "give me N tokens per language of clean, deduped text"
    flow a training-data engine exists for — two shuffles total (the
    dedup hash co-location + the language grouping).
    """
    from ..ops.text import lang_id_batch

    cleaned = corpus_clean(sf_dir, sort=False)

    def add_lang(batch: pa.Table) -> pa.Table:
        # id-keyed curation: the twin composes clean ⋈ lang ON doc_id,
        # so a NULL doc_id never joins — mirror the drop here (the
        # fused engine pipeline would otherwise carry it through)
        batch = batch.filter(pc.is_valid(batch.column("doc_id")))
        lang = lang_id_batch(batch.select(["doc_id", "text"]))
        return batch.append_column("lang_pred", lang.column("lang_pred"))

    ds = cleaned.map_batches(add_lang, batch_format="pyarrow")
    ds = ds.select_columns(["doc_id", "lang_pred", "n_tokens"])
    out = checked_sort(ds, "lang_pred").map_batches(
        _budget_block, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"budget": tokens_per_lang},
    )
    # the language sort's empty ranges yield Ray's schema-less empty
    # blocks; the result is budget-bounded (≤ n_langs × budget tokens),
    # so compacting it is cheap and keeps every block schema-stable
    from ..functions.blocks import compact_small_result

    out = compact_small_result(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang_pred", pa.string()),
                ("n_tokens", pa.int64()),
                ("cum_tokens", pa.int64()),
            ]
        ),
    )
    return out.sort("doc_id") if sort else out


# ---------------------------------------------------------------------------
# sequence packing: documents -> fixed token-budget training shards
# ---------------------------------------------------------------------------

PACK_TOKEN_BUDGET = 4096

# Exclusive running token total (deterministic doc_id order) // budget.
# A document that straddles a boundary belongs to the pack its FIRST
# token lands in — the standard "greedy by offset" packing policy, and
# exactly what the window frame below computes.
TOKEN_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(coalesce(text, ''),
              '{BPE_ISH_PATTERN}')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
         ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         // {PACK_TOKEN_BUDGET} AS pack_id
FROM toks
ORDER BY doc_id
"""


def token_pack(sf_dir: str, *, budget: int = PACK_TOKEN_BUDGET) -> ray.data.Dataset:
    """Pack documents into fixed token-budget training shards.

    The sequence-packing primitive of an LLM data pipeline: every
    document gets a ``pack_id`` so that each pack holds ~``budget``
    BPE-ish tokens, assignment by the document's starting offset in the
    global token stream.  Distributed as a prefix-sum, never a window
    on one node:

    1. one vectorized pass counts tokens per doc (Arrow RE2 kernel),
    2. a global sort on ``doc_id`` (the one exchange), materialized so
       block splits are pinned,
    3. a metadata-only boundary pass ships (first_doc, block_token_sum)
       per block — bytes per block, not rows,
    4. the driver cumsums block token offsets, and a second vectorized
       pass assigns ``pack_id = (block_offset + local_exclusive_cumsum)
       // budget``.

    At 100 TB the only all-to-all carries (doc_id, n_tokens) pairs; the
    boundary table is one row per block.  Mirrors the reference's
    batching-by-size put semantics (PutKinesisStream's byte-budget
    batching, swiftj/nifi-processors PutKinesisStream.java) as a
    deterministic dataset operator.
    """
    from ..ops.text import token_counts_batch

    docs = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )

    def counts(b: pa.Table) -> pa.Table:
        t = token_counts_batch(b)
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()), "n_tokens": t.column("bpe_tokens")}
        )

    ordered = docs.map_batches(counts, batch_format="pyarrow").sort("doc_id").materialize()

    import pyarrow.compute as pc

    from ..functions.blocks import block_offset_index

    offset_by_doc, _ = block_offset_index(
        ordered, ["doc_id"], lambda b: pc.sum(b.column("n_tokens")).as_py()
    )

    def assign(b: pa.Table, *, budget: int) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                }
            )
        off = offset_by_doc[b.column("doc_id")[0].as_py()]  # KeyError = split drift: fail loud
        tok = np.asarray(b.column("n_tokens"))
        excl = off + np.cumsum(tok) - tok
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": b.column("n_tokens"),
                "pack_id": pa.array(excl // budget),
            }
        )

    return ordered.map_batches(
        assign, batch_format="pyarrow", batch_size=None, fn_kwargs={"budget": budget}
    )


# ---------------------------------------------------------------------------
# seeded global shuffle → fixed-size training shards
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 17
SHARD_SIZE = 64

# the engine's shared deterministic Knuth-hash order (same arithmetic as
# events_sample), reproducible across runs and cluster sizes
SHUFFLE_SHARDS_SQL = f"""
WITH h AS (
  SELECT doc_id,
         (CAST((doc_id + {SHUFFLE_SEED}) % 4294967296 AS HUGEINT) * 2654435761)
           % 4294967296 AS hkey
  FROM documents WHERE doc_id IS NOT NULL
),
r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY hkey, doc_id) - 1 AS rank
  FROM h
)
SELECT doc_id,
       CAST(rank // {SHARD_SIZE} AS BIGINT) AS shard,
       CAST(rank % {SHARD_SIZE} AS BIGINT) AS pos_in_shard
FROM r
ORDER BY doc_id
"""


def _shuffle_hash_batch(batch: pa.Table, seed: int) -> pa.Table:
    import pyarrow.compute as pc

    batch = batch.filter(pc.is_valid(batch.column("doc_id")))
    signed = np.asarray(batch.column("doc_id").cast(pa.int64()).combine_chunks())
    if len(signed) and signed.min() < 0:
        # DuckDB's % keeps the dividend's sign while the uint64 view
        # wraps — a negative id would silently desynchronize the deal
        # from the twin (same guard as events._hash_ids)
        raise ValueError("corpus_shuffle_shards requires non-negative doc_id")
    did = signed.astype(np.uint64)
    h = ((did + np.uint64(seed)) % np.uint64(2**32) * np.uint64(2654435761)) % np.uint64(
        2**32
    )
    return pa.table(
        {
            "hkey": pa.array(h.astype(np.int64)),
            "doc_id": batch.column("doc_id").cast(pa.int64()),
        }
    )


def corpus_shuffle_shards(
    sf_dir: str,
    *,
    seed: int = SHUFFLE_SEED,
    shard_size: int = SHARD_SIZE,
    sort: bool = True,
) -> ray.data.Dataset:
    """Deterministic seeded GLOBAL shuffle of the corpus into fixed-size
    training shards — the reproducible-ordering step every training
    export runs (a true ``random_shuffle`` is neither reproducible
    across cluster sizes nor oracle-checkable).

    Shuffle order = the shared Knuth multiplicative hash of
    ``doc_id + seed`` (ties impossible: doc_id breaks them); the global
    rank comes from the distributed block-offset pattern (sorted blocks
    report boundary metadata, the driver cumsums ≤blocks rows), so the
    window never runs on one node; ``shard = rank // shard_size`` and
    ``pos_in_shard = rank % shard_size`` are then block-local
    arithmetic.  Changing ``seed`` re-deals every shard
    deterministically.
    """
    from ..functions.blocks import block_offset_index

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id"]
    )
    hashed = ds.map_batches(
        _shuffle_hash_batch, batch_format="pyarrow", fn_kwargs={"seed": seed}
    )
    ordered = checked_sort(hashed, ["hkey", "doc_id"]).materialize()
    offset_by_key, _total = block_offset_index(
        ordered, ["hkey", "doc_id"], lambda b: b.num_rows
    )

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "pos_in_shard": pa.array([], pa.int64()),
                }
            )
        first = (b.column("hkey")[0].as_py(), b.column("doc_id")[0].as_py())
        off = offset_by_key[first]  # KeyError = block split drifted: fail loud
        ranks = off + np.arange(b.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "shard": pa.array(ranks // shard_size),
                "pos_in_shard": pa.array(ranks % shard_size),
            }
        )

    out = ordered.map_batches(assign, batch_format="pyarrow", batch_size=None)
    from ..functions.debug import null_safe_sort

    return null_safe_sort(out, "doc_id") if sort else out
