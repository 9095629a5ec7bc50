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
import ray.data

from ..sources.reader import read_parquet as read_parquet_clean

from ..functions.debug import checked_sort
from ..ops.dedup import EXACT_DEDUP_SQL, _add_text_hash, _first_per_text
from ..ops.text import STOPWORDS, _per_list_sum, _token_lists

MIN_TOKENS = 20
MAX_STOPWORD_RATIO = 0.5

CORPUS_CLEAN_SQL = f"""
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
ORDER BY doc_id
"""


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
