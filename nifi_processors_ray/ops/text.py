"""Text-analysis operators: token stats, quality, language ID, fingerprints.

All stateless, vectorized ``map_batches(batch_format='pyarrow')`` stages
— the per-record "processor logic" role of the reference's FlowFile
transforms (``consumer/GetKinesisStream.java:307-322`` projected
metadata per record; here the projection is computed, not copied).

Tokenization contract (shared with the SQL oracles): tokens are the
single-space split of ``text`` — ``n_tokens = count(' ') + 1``, matching
DuckDB ``len(str_split(text, ' '))`` exactly.  Float columns are
computed with the same IEEE double operation order as the SQL twin so
value-hash comparison is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.debug import checked_sort
from ..sources.reader import read_parquet_fanout as read_parquet_clean

STOPWORDS = ("the", "a")

# ---------------------------------------------------------------------------
# token / quality statistics (SQL-mirrorable)
# ---------------------------------------------------------------------------

TEXT_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, n_chars,
         len(str_split(coalesce(text, ''), ' ')) AS n_tokens,
         len(list_filter(str_split(coalesce(text, ''), ' '), x -> x IN {STOPWORDS!r}))
           AS stop_count
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, stop_count,
       CAST(stop_count AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
       (LEAST(n_tokens, 100) / 100.0 + (1.0 - CAST(stop_count AS DOUBLE) / n_tokens)) / 2.0
         AS quality_score
FROM toks
ORDER BY doc_id
"""


def _token_lists(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Split to a flat token values array + per-doc list offsets."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return lists.values, np.asarray(lists.offsets)


def _per_list_sum(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum a flat 0/1 array per list window given list offsets."""
    if len(offsets) <= 1:
        return np.zeros(0, dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(flags, dtype=np.int64)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id → token/quality statistics (vectorized, zero Python loops).

    Null text counts as the empty document (mirrors the SQL twin's
    ``coalesce(text, '')``) — without the fill, the null count_substring
    result turns into an undefined NaN→int64 cast."""
    text = pc.fill_null(batch.column("text"), "")
    # n_chars comes from the TABLE (not recomputed): a null must stay
    # null through to n_chars AND avg_token_len, like the twin — the
    # raw to_numpy would surface it as NaN and NaN→int64 is undefined
    nc_col = batch.column("n_chars").cast(pa.int64()).combine_chunks()
    nc_null = np.asarray(pc.is_null(nc_col))
    n_chars = np.asarray(pc.fill_null(nc_col, 0))
    n_tokens = (pc.count_substring(text, " ").to_numpy(zero_copy_only=False) + 1).astype(np.int64)

    values, offsets = _token_lists(text)
    is_stop = pc.is_in(values, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    stop_count = _per_list_sum(is_stop.astype(np.int64), offsets)

    # Same double-op order as TEXT_STATS_SQL (bit-exact value hashes).
    stopword_ratio = stop_count.astype(np.float64) / n_tokens
    avg_token_len = (n_chars - (n_tokens - 1)).astype(np.float64) / n_tokens
    quality_score = (np.minimum(n_tokens, 100) / 100.0 + (1.0 - stopword_ratio)) / 2.0

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, mask=nc_null),
            "n_tokens": pa.array(n_tokens),
            "stop_count": pa.array(stop_count),
            "stopword_ratio": pa.array(stopword_ratio),
            "avg_token_len": pa.array(avg_token_len, mask=nc_null),
            "quality_score": pa.array(quality_score),
        }
    )


def text_stats(sf_dir: str) -> ray.data.Dataset:
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return ds.map_batches(text_stats_batch, batch_format="pyarrow").sort("doc_id")


def text_stats_jsonl(sf_dir: str) -> ray.data.Dataset:
    """:func:`text_stats` over a JSONL round-trip of the documents table —
    the driver-facing proof of the format surface: same operator, same
    parquet-derived SQL oracle, input arriving as multi-file ``.jsonl``."""
    from ..sources.exports import DOCUMENTS_EXPORT_SCHEMA, documents_jsonl
    from ..sources.reader import read_jsonl

    ds = read_jsonl(
        documents_jsonl(sf_dir),
        schema=DOCUMENTS_EXPORT_SCHEMA,
        columns=["doc_id", "text", "n_chars"],
    )
    return ds.map_batches(text_stats_batch, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# language identification (n-gram/stopword profile heuristic)
# ---------------------------------------------------------------------------

# Tiny marker-word profiles (public knowledge; the classic stopword-profile
# approach).  Scores are marker hits per token; argmax with deterministic
# tie-break on profile order.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that", "it", "with"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "zu"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}
_LANGS = tuple(_LANG_PROFILES)


def _build_lang_id_sql() -> str:
    """Exact SQL twin of :func:`lang_id_batch`, generated from the SAME
    profiles: per-language marker-hit counts via ``list_filter``, argmax
    with first-max-wins tie-break reproduced as a CASE chain comparing
    each language only against LATER ones (profile order), 'und' when no
    marker hits at all.  Confidence is one double division (hits /
    n_tokens) — identical IEEE op both sides, so the value hash is
    bit-exact (same contract as TEXT_STATS_SQL)."""
    langs = list(_LANGS)
    hit_exprs = []
    for lang in langs:
        vals = ", ".join("'" + w.replace("'", "''") + "'" for w in _LANG_PROFILES[lang])
        hit_exprs.append(f"len(list_filter(ts, x -> x IN ({vals}))) AS h_{lang}")
    cases = []
    for i, lang in enumerate(langs):
        later = [f"h_{m}" for m in langs[i + 1 :]]
        cond = f"h_{lang} >= greatest({', '.join(later)})" if later else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    all_h = ", ".join(f"h_{lang}" for lang in langs)
    hits_block = ",\n         ".join(hit_exprs)
    case_block = "\n            ".join(cases)
    return f"""
WITH toks AS (
  SELECT doc_id, str_split(lower(coalesce(text, '')), ' ') AS ts FROM documents
),
scored AS (
  SELECT doc_id, greatest(1, len(ts)) AS n_tokens,
         {hits_block}
  FROM toks
)
SELECT doc_id,
       CASE WHEN greatest({all_h}) = 0 THEN 'und'
            {case_block}
       END AS lang_pred,
       CAST(greatest({all_h}) AS DOUBLE) / n_tokens AS confidence
FROM scored
"""


# ORDER-BY-free body, composable as a CTE (pipelines/corpus.py reuses it)
LANG_ID_BODY = _build_lang_id_sql()
LANG_ID_SQL = LANG_ID_BODY + "ORDER BY doc_id"


def lang_id_batch(batch: pa.Table) -> pa.Table:
    text = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    values, offsets = _token_lists(text)
    n_tokens = np.maximum(np.diff(offsets), 1)

    scores = np.zeros((len(_LANGS), len(n_tokens)), dtype=np.float64)
    for i, lang in enumerate(_LANGS):
        hits = pc.is_in(values, value_set=pa.array(_LANG_PROFILES[lang]))
        per_doc = _per_list_sum(hits.to_numpy(zero_copy_only=False).astype(np.int64), offsets)
        scores[i] = per_doc / n_tokens
    best = scores.argmax(axis=0)  # first max wins → deterministic tie-break
    top = scores[best, np.arange(scores.shape[1])]
    conf = np.where(top > 0, top, 0.0)
    pred = np.asarray(_LANGS, dtype=object)[best]
    pred[top == 0] = "und"  # no markers at all → undetermined
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(pred, type=pa.string()),
            "confidence": pa.array(conf),
        }
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(lang_id_batch, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# document fingerprint (rolling polynomial hash over tokens)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)  # FNV prime as polynomial base
_FP_SEED = np.uint64(14695981039346656037)  # FNV offset basis


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Order-sensitive 64-bit fingerprint: H = ((seed*B + h(t0))*B + h(t1))...

    Vectorized per batch: token hashes via the engine's stable string
    hash, then a per-document Horner reduction over the token windows
    (numpy loop over the max token count, not over documents).
    """
    from ..functions.hashing import hash_strings_u64

    values, offsets = _token_lists(pc.fill_null(batch.column("text"), ""))
    tok_h = hash_strings_u64(values)
    counts = np.diff(offsets)
    n = len(counts)
    fp = np.full(n, _FP_SEED, dtype=np.uint64)
    if n and counts.max() > 0:
        # Horner step k applies to all docs having > k tokens.
        max_c = int(counts.max())
        starts = offsets[:-1]
        for k in range(max_c):
            live = counts > k
            # python-int k: an np.uint64 scalar would promote the int64
            # index array to float64 under NumPy 2 (NEP 50)
            fp[live] = fp[live] * _FP_BASE + tok_h[starts[live] + k]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fp.astype(np.int64)),  # two's-complement int64
            "n_tokens": pa.array(counts.astype(np.int64)),
        }
    )


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# token counting: whitespace + BPE-ish regex (SQL-mirrorable)
# ---------------------------------------------------------------------------

# Subword-ish tokenization: letter runs, digit runs, single punctuation.
# ASCII-only, alternatives disjoint — so RE2 (pyarrow's and DuckDB's
# shared regex engine) and any leftmost-first engine agree exactly.  The
# regex is compiled once per process inside Arrow's C++ kernel; the hot
# path is one vectorized `count_substring_regex` call per batch.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len(str_split(coalesce(text, ''), ' ')) AS ws_tokens,
       len(regexp_extract_all(coalesce(text, ''), '{BPE_ISH_PATTERN}')) AS bpe_tokens
FROM documents
ORDER BY doc_id
"""


def token_counts_batch(batch: pa.Table) -> pa.Table:
    text = pc.fill_null(batch.column("text"), "")
    ws = (pc.count_substring(text, " ").to_numpy(zero_copy_only=False) + 1).astype(np.int64)
    bpe = pc.count_substring_regex(text, BPE_ISH_PATTERN).cast(pa.int64())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "ws_tokens": pa.array(ws),
            "bpe_tokens": bpe,
        }
    )


def token_counts(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """Whitespace + BPE-ish-regex token counts per document — the token
    budgeting primitive for training-data pipelines, fully vectorized
    (the regex runs compiled inside Arrow's RE2 kernel)."""
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(token_counts_batch, batch_format="pyarrow")
    return out.sort("doc_id") if sort else out


# ---------------------------------------------------------------------------
# corpus-wide n-gram statistics (vocab / collocation analysis)
# ---------------------------------------------------------------------------

TOP_NGRAMS_K = 20

TOP_NGRAMS_SQL = f"""
WITH toks AS (
  SELECT str_split(lower(coalesce(text, '')), ' ') AS t FROM documents
),
ng AS (
  SELECT array_to_string(list_slice(t, i, i + 1), ' ') AS ngram
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i)
)
SELECT ngram, COUNT(*) AS n
FROM ng
GROUP BY ngram
ORDER BY n DESC, ngram
LIMIT {TOP_NGRAMS_K}
"""


def _bigram_partials(batch: pa.Table) -> pa.Table:
    """Per-batch bigram counts: flat token array + one vectorized join of
    adjacent tokens, masked at document boundaries, then an Arrow C++
    hash-count.  The shuffle moves per-batch (ngram, n) partials — the
    corpus-wide vocabulary never materializes in one place."""
    text = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    values, offsets = _token_lists(text)
    nv = len(values)
    if nv < 2:
        return pa.table({"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    grams = pc.binary_join_element_wise(values.slice(0, nv - 1), values.slice(1), " ")
    # position i pairs token i with i+1: valid iff both in the same doc,
    # i.e. i+1 is not a document start offset
    valid = np.ones(nv - 1, dtype=bool)
    starts = offsets[1:-1]  # interior doc starts
    valid[starts - 1] = False
    g = (
        pa.table({"ngram": grams.filter(pa.array(valid))})
        .group_by(["ngram"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {"ngram": g.column("ngram"), "n": g.column("count_all")}
    )


def top_ngrams(sf_dir: str, *, k: int = TOP_NGRAMS_K) -> ray.data.Dataset:
    """Corpus-wide top-k bigrams by count — the vocabulary/collocation
    statistic of a training-data pipeline, combiner-style: per-batch
    Arrow hash-counts, ONE small groupby over partials, deterministic
    (count desc, ngram asc) order."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["text"]
    )
    partials = ds.map_batches(_bigram_partials, batch_format="pyarrow")
    from ..functions.debug import null_safe_groupby_agg

    return (
        null_safe_groupby_agg(
            partials, "ngram", Sum("n", alias_name="n"), out_types={"n": pa.int64()}
        )
        .sort(["n", "ngram"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# regex redaction (the reference's ReplaceText-style content transform)
# ---------------------------------------------------------------------------

# Stand-in sensitive-term pattern over the synthetic corpus (real
# deployments swap in PII patterns — emails, phone runs).  Word-bounded
# alternation keeps RE2 (pyarrow's and DuckDB's shared engine) exact on
# both sides; the replacement is applied globally per document.
REDACT_PATTERN = r"\b(customer|key)\b"
REDACT_TOKEN = "[REDACTED]"

TEXT_REDACT_SQL = rf"""
SELECT doc_id,
       regexp_replace(coalesce(text, ''), '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g')
         AS redacted,
       len(regexp_split_to_array(coalesce(text, ''), '{REDACT_PATTERN}')) - 1
         AS n_redactions
FROM documents
ORDER BY doc_id
"""


def text_redact_batch(batch: pa.Table) -> pa.Table:
    """doc_id → globally-redacted text + match count, all inside Arrow's
    RE2 kernels (one compiled-regex pass each for replace and count — no
    Python touches a string)."""
    text = pc.fill_null(batch.column("text"), "")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "redacted": pc.replace_substring_regex(
                text, pattern=REDACT_PATTERN, replacement=REDACT_TOKEN
            ),
            "n_redactions": pc.count_substring_regex(text, REDACT_PATTERN).cast(pa.int64()),
        }
    )


def text_redact(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """Regex content redaction — the reference's ReplaceText-style
    per-record transform (`consumer/GetKinesisStream.java`'s per-record
    projection role) as a stateless vectorized map: no shuffle, rows
    stream straight through, scale cost is one RE2 scan per byte."""
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(text_redact_batch, batch_format="pyarrow")
    return out.sort("doc_id") if sort else out


def token_counts_csv(sf_dir: str) -> ray.data.Dataset:
    """:func:`token_counts` over a CSV round-trip of the documents table —
    the CSV leg of the format-surface proof (same parquet-derived SQL
    oracle)."""
    from ..sources.exports import DOCUMENTS_EXPORT_SCHEMA, documents_csv
    from ..sources.reader import read_csv

    ds = read_csv(
        documents_csv(sf_dir),
        schema=DOCUMENTS_EXPORT_SCHEMA,
        columns=["doc_id", "text"],
    )
    return ds.map_batches(token_counts_batch, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap scrub)
# ---------------------------------------------------------------------------

DECONTAM_MOD = 20  # doc_id % 20 == 0 → the held-out "benchmark" slice
DECONTAM_N = 3  # word n-gram size

DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, str_split(lower(coalesce(text, '')), ' ') AS t FROM documents
),
ng AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + {DECONTAM_N - 1}), ' ') AS ngram
  FROM toks, UNNEST(range(1, greatest(len(t) - {DECONTAM_N - 1}, 0) + 1)) AS r(i)
),
bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % {DECONTAM_MOD} = 0)
SELECT n.doc_id, COUNT(DISTINCT n.ngram) AS n_overlap
FROM ng n JOIN bench b USING (ngram)
WHERE n.doc_id % {DECONTAM_MOD} <> 0
GROUP BY n.doc_id
ORDER BY n.doc_id
"""


def _trigrams(batch: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """Flat lowercase word-trigram array for a batch of documents plus
    the doc index of each trigram — adjacent-token joins masked at
    document boundaries (same layout trick as :func:`_bigram_partials`)."""
    text = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    values, offsets = _token_lists(text)
    nv = len(values)
    k = DECONTAM_N
    if nv < k:
        return pa.array([], pa.string()), np.zeros(0, dtype=np.int64)
    grams = pc.binary_join_element_wise(
        values.slice(0, nv - k + 1), values.slice(1, nv - k + 1), values.slice(2), " "
    )
    # trigram at position i spans tokens [i, i+2]: valid iff no doc
    # start falls in (i, i+2], i.e. i >= start or i+2 < next start
    doc_of = np.searchsorted(offsets, np.arange(nv), side="right") - 1
    valid = doc_of[: nv - k + 1] == doc_of[k - 1 :]
    return grams.filter(pa.array(valid)), doc_of[: nv - k + 1][valid]


def _bench_ngram_batch(batch: pa.Table) -> pa.Table:
    grams, _ = _trigrams(batch)
    return pa.table({"ngram": pc.unique(grams)})


def decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Benchmark decontamination: flag training documents sharing any
    word-trigram with the held-out benchmark slice (doc_id % 20 == 0),
    with the count of DISTINCT overlapping trigrams per document.

    Scale shape: the benchmark side is small BY DEFINITION (an eval
    set), so its distinct trigrams are collected once and broadcast via
    ``ray.put`` — the training corpus then streams through a pure
    ``map_batches`` (``pc.is_in`` membership against the shared Arrow
    array, zero-copy from the object store), no shuffle at any point:
    each document's distinct-overlap count is batch-local because a
    document never spans batches.
    """
    import ray as _ray

    path = f"{sf_dir.rstrip('/')}/documents.parquet"

    def is_bench(b: pa.Table) -> pa.Table:
        keep = np.asarray(b.column("doc_id")) % DECONTAM_MOD == 0
        return b.filter(pa.array(keep))

    bench_parts = (
        read_parquet_clean(path, columns=["doc_id", "text"])
        .map_batches(is_bench, batch_format="pyarrow")
        .map_batches(_bench_ngram_batch, batch_format="pyarrow")
        .take_all()  # bounded by the eval set's vocabulary — small side
    )
    bench = pc.unique(pa.concat_arrays(
        [pa.array([r["ngram"] for r in bench_parts], pa.string())]
    ))
    bench_ref = _ray.put(bench)

    def scan(b: pa.Table) -> pa.Table:
        bench_arr = _ray.get(bench_ref)
        train_mask = np.asarray(b.column("doc_id")) % DECONTAM_MOD != 0
        b = b.filter(pa.array(train_mask))
        grams, doc_of = _trigrams(b)
        if len(grams) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_overlap": pa.array([], pa.int64())}
            )
        hit = pc.is_in(grams, value_set=bench_arr)
        hm = np.asarray(hit)
        t = pa.table(
            {
                "doc_id": b.column("doc_id").take(pa.array(doc_of[hm], pa.int64())),
                "ngram": grams.filter(hit),
            }
        )
        # distinct overlapping trigrams per doc, all batch-local
        g = (
            t.group_by(["doc_id", "ngram"])
            .aggregate([([], "count_all")])
            .group_by(["doc_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "doc_id": g.column("doc_id").cast(pa.int64()),
                "n_overlap": g.column("count_all"),
            }
        )

    out = read_parquet_clean(path, columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow"
    )
    return out.sort("doc_id")


# ---------------------------------------------------------------------------
# per-document repetition metrics (Gopher/C4-style quality signals)
# ---------------------------------------------------------------------------

DOC_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, str_split(lower(coalesce(text, '')), ' ') AS t FROM documents
),
wx AS (SELECT doc_id, unnest(t) AS w FROM toks),
dw AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words
  FROM wx GROUP BY doc_id
),
bg AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS gram
  FROM toks, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS r(i)
),
bgc AS (SELECT doc_id, gram, COUNT(*) AS n FROM bg GROUP BY 1, 2),
top AS (
  SELECT doc_id, gram, n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, gram) AS rn
  FROM bgc
)
SELECT dw.doc_id, dw.n_words, dw.n_distinct_words,
       CAST(dw.n_words - 1 AS BIGINT) AS n_bigrams,
       t.gram AS top_bigram,
       CAST(t.n AS BIGINT) AS top_bigram_n
FROM dw LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
ORDER BY doc_id
"""


def _repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals, all Arrow/numpy: duplicate-word mass
    (n_words vs n_distinct_words) and the most-repeated bigram — the
    Gopher-style repetition filters a training-data pipeline gates on.
    Document-local by definition, so the operator is a pure map: no
    shuffle at any scale."""
    nd = batch.num_rows
    text = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    values, offsets = _token_lists(text)
    n_words = np.diff(offsets).astype(np.int64)
    d_idx = np.repeat(np.arange(nd, dtype=np.int64), n_words)
    # distinct words per doc: Arrow hash-distinct on (doc, word) pairs
    pairs = pa.table({"d": pa.array(d_idx), "w": values}).group_by(["d", "w"]).aggregate([])
    n_distinct = np.bincount(np.asarray(pairs.column("d")), minlength=nd).astype(np.int64)
    # bigrams: adjacent-token join masked at doc boundaries
    nv = len(values)
    top_gram = pa.nulls(nd, pa.string())
    top_n = np.full(nd, -1, dtype=np.int64)  # -1 = no bigrams → NULL
    if nv >= 2:
        grams = pc.binary_join_element_wise(values.slice(0, nv - 1), values.slice(1), " ")
        valid = np.ones(nv - 1, dtype=bool)
        starts = offsets[1:-1]
        valid[starts - 1] = False
        gd = d_idx[: nv - 1][valid]
        gc = (
            pa.table({"d": pa.array(gd), "g": grams.filter(pa.array(valid))})
            .group_by(["d", "g"])
            .aggregate([([], "count_all")])
        )
        gc = gc.sort_by(
            [("d", "ascending"), ("count_all", "descending"), ("g", "ascending")]
        )
        dcol = np.asarray(gc.column("d"))
        if len(dcol):
            first = np.concatenate([[True], dcol[1:] != dcol[:-1]])
            widx = np.nonzero(first)[0]
            wins_d = dcol[widx]
            top_n[wins_d] = np.asarray(gc.column("count_all"))[widx]
            scatter = np.full(nd, -1, dtype=np.int64)
            scatter[wins_d] = widx
            has = scatter >= 0
            taken = gc.column("g").take(pa.array(scatter[has]))
            # scatter the winners into a full-length column (NULL elsewhere)
            full = np.full(nd, None, dtype=object)
            full[has] = np.asarray(taken).astype(object)
            top_gram = pa.array(full, pa.string())
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "n_bigrams": pa.array(np.maximum(n_words - 1, 0)),
            "top_bigram": top_gram,
            "top_bigram_n": pc.if_else(
                pa.array(top_n >= 0), pa.array(top_n, pa.int64()), pa.nulls(nd, pa.int64())
            ),
        }
    )


def doc_repetition(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """Per-document repetition profile: word counts, distinct-word
    counts and the most-repeated bigram (count-desc, lexicographic
    tie-break; NULL when the doc has no bigrams).  The duplicate-word
    and repeated-n-gram fractions these integers define are the
    standard repetition quality gates; exposing exact integer numerators
    keeps the oracle hash float-free."""
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(_repetition_batch, batch_format="pyarrow")
    return out.sort("doc_id") if sort else out


# ---------------------------------------------------------------------------
# corpus governance rollup: volume/token accounting per (source, lang)
# ---------------------------------------------------------------------------

SOURCE_ROLLUP_SQL = f"""
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       CAST(SUM(len(regexp_extract_all(coalesce(text, ''), '{BPE_ISH_PATTERN}'))) AS BIGINT)
         AS bpe_tokens
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _source_rollup_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (source, lang) partials: doc counts, char mass, BPE-ish
    token mass — tokenization runs once per batch in Arrow's RE2 kernel,
    and only ≤(sources × langs) rows per batch reach the exchange."""
    text = pc.fill_null(batch.column("text"), "")
    t = pa.table(
        {
            "source": batch.column("source"),
            "lang": batch.column("lang"),
            "chars": batch.column("n_chars").cast(pa.int64()),
            "toks": pc.count_substring_regex(text, BPE_ISH_PATTERN).cast(pa.int64()),
        }
    )
    g = t.group_by(["source", "lang"]).aggregate(
        [([], "count_all"), ("chars", "sum"), ("toks", "sum")]
    )
    return pa.table(
        {
            "source": g.column("source"),
            "lang": g.column("lang"),
            "n_docs": g.column("count_all").cast(pa.int64()),
            "chars": g.column("chars_sum"),
            "bpe_tokens": g.column("toks_sum"),
        }
    )


def corpus_source_rollup(sf_dir: str, *, sort: bool = True) -> ray.data.Dataset:
    """Corpus governance accounting: document, character and token
    volumes per (source, lang) — the table a 100 TB curation pipeline
    reports before/after every filter stage.  Stateless partials bound
    the exchange by the (source × lang) cardinality; null keys form
    their own groups (SQL GROUP BY parity via the null-safe exchange)."""
    from ray.data.aggregate import Sum

    from ..functions.debug import null_safe_groupby_agg, null_safe_sort

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet",
        columns=["source", "lang", "text", "n_chars"],
    )
    out = null_safe_groupby_agg(
        ds.map_batches(_source_rollup_partial, batch_format="pyarrow"),
        ["source", "lang"],
        Sum("n_docs", alias_name="n_docs"),
        Sum("chars", alias_name="chars"),
        Sum("bpe_tokens", alias_name="bpe_tokens"),
        out_types={"n_docs": pa.int64(), "chars": pa.int64(), "bpe_tokens": pa.int64()},
    )
    return null_safe_sort(out, ["source", "lang"]) if sort else out


# ---------------------------------------------------------------------------
# TF-IDF-style salient terms per document (integer-exact scoring)
# ---------------------------------------------------------------------------

TOP_TERMS_K = 3

# Integer rarity weighting: score = tf * (N_docs - df).  The classic
# tf*log(N/df) ranks identically for a fixed tf when df is smaller, and
# an all-integer score keeps the oracle value-hash IEEE-proof (no libm
# log whose low bits could differ between DuckDB and numpy).
DOC_TOP_TERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(str_split(lower(coalesce(text, '')), ' ')) AS term
  FROM documents WHERE doc_id IS NOT NULL
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
-- N is the raw corpus row count (the engine reads it from the parquet
-- footer), NOT the null-filtered count — keep the two in lockstep
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(t.tf * ((SELECT n_docs FROM n) - d.df) AS BIGINT) AS score
  FROM tf t JOIN df d USING (term)
)
SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored
)
WHERE rn <= {TOP_TERMS_K}
ORDER BY doc_id, rn
"""


def _doc_term_tf(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, term, tf) rows.  Tokenization is the shared
    lowercase-whitespace contract (same as :data:`TOP_NGRAMS_SQL`), and
    Arrow's ``split_pattern`` matches DuckDB's ``str_split`` exactly on
    the edges (empty text → [''], runs of spaces → empty terms) —
    verified empirically.  Each document lives wholly in one batch, so
    the per-batch (doc_id, term) group count is the doc's EXACT tf and
    the pair is globally unique."""
    batch = batch.filter(pc.is_valid(batch.column("doc_id")))
    toks = pc.split_pattern(
        pc.utf8_lower(pc.fill_null(batch.column("text"), "")), pattern=" "
    ).combine_chunks()
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    doc = np.repeat(np.asarray(batch.column("doc_id"), dtype=np.int64), lens)
    flat = pc.list_flatten(toks)
    t = pa.table({"doc_id": pa.array(doc), "term": flat})
    g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "doc_id": g.column("doc_id"),
            "term": g.column("term"),
            "tf": g.column("count_all").cast(pa.int64()),
        }
    )


def _attach_df_block(block: pa.Table) -> pa.Table:
    """One co-located term run = the term's FULL posting list ((doc_id,
    term) is globally unique, so run length IS the document frequency).
    Hot terms (stop words) make runs that must fit one block —
    ``checked_sort``'s run-integrity repair coalesces up to worker
    memory and fails loud beyond; the broadcast-df variant is the
    escape hatch if a corpus ever exceeds that."""
    n = block.num_rows
    if n == 0:
        return block.append_column("df", pa.array([], pa.int64()))
    block = block.sort_by([("term", "ascending")])
    term = block.column("term").combine_chunks().dictionary_encode()
    codes = np.asarray(pc.fill_null(term.indices, -1), dtype=np.int64)
    new_run = np.concatenate([[True], codes[1:] != codes[:-1]])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.concatenate([starts, [n]]))
    df = np.repeat(run_len, run_len).astype(np.int64)
    return block.append_column("df", pa.array(df))


def _top_terms_block(block: pa.Table, n_docs: int, k: int) -> pa.Table:
    """Rank terms within each co-located doc run by (score desc, term
    asc) and keep the top ``k`` — the same block-local window pattern as
    the join family's top-N-per-group."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
        }
    )
    n = block.num_rows
    if n == 0:
        return empty
    score = pc.multiply_checked(
        block.column("tf"), pc.subtract_checked(pa.scalar(n_docs, pa.int64()), block.column("df"))
    )
    block = block.append_column("score", score)
    block = block.sort_by(
        [("doc_id", "ascending"), ("score", "descending"), ("term", "ascending")]
    )
    doc = np.asarray(block.column("doc_id"))
    new_run = np.concatenate([[True], doc[1:] != doc[:-1]])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.concatenate([starts, [n]]))
    rn = np.arange(n, dtype=np.int64) - np.repeat(starts, run_len) + 1
    keep = rn <= k
    kept = block.filter(pa.array(keep))
    return pa.table(
        {
            "doc_id": kept.column("doc_id"),
            "term": kept.column("term"),
            "tf": kept.column("tf"),
            "df": kept.column("df"),
            "score": kept.column("score"),
            "rn": pa.array(rn[keep]),
        }
    )


def doc_top_terms(sf_dir: str, *, k: int = TOP_TERMS_K, sort: bool = True) -> ray.data.Dataset:
    """Top-``k`` salient terms per document by integer TF-IDF
    (``tf * (N - df)``) — the keyword-extraction primitive for corpus
    curation, distributed as TWO sort exchanges and zero broadcasts:

    1. tokenize → per-batch exact (doc_id, term, tf) rows (each doc is
       wholly in one batch);
    2. exchange on ``term``: a co-located run is the term's full posting
       list, so ``df`` = run length — the document-frequency join costs
       no separate aggregate or broadcast;
    3. exchange on ``doc_id``: block-local (score desc, term asc)
       ranking keeps the top ``k`` per doc.

    ``N`` (corpus size) comes from the parquet footer — no extra scan.
    """
    import pyarrow.parquet as pq

    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    n_docs = pq.ParquetFile(path).metadata.num_rows
    ds = read_parquet_clean(path, columns=["doc_id", "text"])
    tf = ds.map_batches(_doc_term_tf, batch_format="pyarrow")
    with_df = checked_sort(tf, "term").map_batches(
        _attach_df_block, batch_format="pyarrow", batch_size=None
    )
    out = checked_sort(with_df, "doc_id").map_batches(
        _top_terms_block, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"n_docs": n_docs, "k": k},
    )
    return out.sort(["doc_id", "rn"]) if sort else out


# ---------------------------------------------------------------------------
# document chunking: fixed-size overlapping windows for context packing
# ---------------------------------------------------------------------------

CHUNK_SIZE = 200  # characters per chunk
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks
_CHUNK_SERIES_MAX = 10_000  # twin-side series bound (far above any doc)

# DuckDB's generate_series ERRORS on an empty range (0..-1), so the twin
# joins a fixed series against the start-inside-text predicate instead of
# a per-row upper bound; g*stride < length(text) yields exactly
# ceil(len/stride) chunks for len > 0, zero for empty, none for NULL.
DOC_CHUNKS_SQL = f"""
SELECT d.doc_id,
       s.g AS chunk_idx,
       substr(d.text, CAST(s.g * {CHUNK_STRIDE} + 1 AS BIGINT), {CHUNK_SIZE})
         AS chunk_text,
       CAST(length(substr(d.text, CAST(s.g * {CHUNK_STRIDE} + 1 AS BIGINT),
                          {CHUNK_SIZE})) AS BIGINT) AS n_chunk_chars
FROM documents d
JOIN (SELECT g FROM generate_series(0, {_CHUNK_SERIES_MAX}) t(g)) s
  ON s.g * {CHUNK_STRIDE} < length(d.text)
ORDER BY d.doc_id, s.g
"""


def _chunk_batch(batch: pa.Table, size: int, stride: int) -> pa.Table:
    """Expand each document into its overlapping windows — one
    vectorized slice PER CHUNK ORDINAL (bounded by the longest doc in
    the batch), never per row.  Character semantics match the twin:
    ``utf8_length`` / ``utf8_slice_codeunits`` count codepoints exactly
    like DuckDB's ``length`` / ``substr``.  NULL text yields no chunks
    (the twin's join predicate is NULL)."""
    lens = pc.utf8_length(batch.column("text"))
    parts = []
    k = 0
    while True:
        mask = pc.greater(lens, k * stride)  # NULL text → NULL → dropped
        sub = batch.filter(mask)
        if sub.num_rows == 0:
            break
        if k > _CHUNK_SERIES_MAX:
            # the twin's generate_series stops here; silent divergence
            # on a ~1.5M-char doc is worse than a loud error
            raise ValueError(
                f"doc_chunks: document needs more than {_CHUNK_SERIES_MAX} "
                "chunks — raise _CHUNK_SERIES_MAX (twin bound) in lockstep"
            )
        chunk = pc.utf8_slice_codeunits(
            sub.column("text"), start=k * stride, stop=k * stride + size
        )
        parts.append(
            pa.table(
                {
                    "doc_id": sub.column("doc_id").cast(pa.int64()),
                    "chunk_idx": pa.array(
                        np.full(sub.num_rows, k, dtype=np.int64)
                    ),
                    "chunk_text": chunk,
                    "n_chunk_chars": pc.utf8_length(chunk).cast(pa.int64()),
                }
            )
        )
        k += 1
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_chunk_chars": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def doc_chunks(
    sf_dir: str,
    *,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    sort: bool = True,
) -> ray.data.Dataset:
    """Fixed-size overlapping character windows per document — the
    chunking stage every retrieval / context-packing pipeline runs
    before embedding.  Pure map (no exchange): each batch expands to
    its chunks with one vectorized slice per chunk ordinal; output is
    ~``size/stride`` × corpus bytes, streamed block by block.  ``sort``
    orders by (doc_id, chunk_idx) for the oracle compare; production
    callers keep ``sort=False`` and write chunks as they stream."""
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(
        _chunk_batch, batch_format="pyarrow", fn_kwargs={"size": size, "stride": stride}
    )
    from ..functions.debug import null_safe_sort

    return null_safe_sort(out, ["doc_id", "chunk_idx"]) if sort else out
