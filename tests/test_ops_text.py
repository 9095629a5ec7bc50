"""Text-analysis operators vs DuckDB / hand-computed oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from nifi_processors_ray.ops import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def test_text_stats_matches_sql_bit_exact(con):
    got = T.text_stats(SF_DIR).to_pandas()
    want = con.sql(T.TEXT_STATS_SQL).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )  # strict: includes float bit-equality


def test_text_stats_hand_example():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["the quick a fox the"]),
            "n_chars": pa.array([19], pa.int64()),
        }
    )
    out = T.text_stats_batch(batch).to_pylist()[0]
    assert out["n_tokens"] == 5
    assert out["stop_count"] == 3  # the, a, the
    assert out["stopword_ratio"] == 3 / 5
    assert out["avg_token_len"] == (19 - 4) / 5


def test_lang_id_detects_marker_languages():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat and it is happy",
                    "le chat est sur la table et il est content",
                    "der hund ist nicht in das haus und die katze",
                    "zzz qqq xxx",  # no markers at all
                ]
            ),
        }
    )
    out = {r["doc_id"]: r for r in T.lang_id_batch(batch).to_pylist()}
    assert out[0]["lang_pred"] == "en"
    assert out[1]["lang_pred"] == "fr"
    assert out[2]["lang_pred"] == "de"
    assert out[3]["lang_pred"] == "und" and out[3]["confidence"] == 0.0


def test_fingerprint_order_sensitive_and_stable():
    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "c b a", "a b c"]),
        }
    )
    fp = T.fingerprint_batch(b).to_pylist()
    assert fp[0]["fingerprint"] == fp[2]["fingerprint"]  # deterministic
    assert fp[0]["fingerprint"] != fp[1]["fingerprint"]  # order-sensitive
    assert fp[0]["n_tokens"] == 3
    # stable across processes: recompute must give the identical value
    again = T.fingerprint_batch(b.slice(0, 1)).to_pylist()[0]
    assert again["fingerprint"] == fp[0]["fingerprint"]


def test_fingerprint_full_table_unique_rate():
    out = T.doc_fingerprint(SF_DIR).to_pandas()
    # no duplicate texts in the corpus → no duplicate fingerprints
    assert out["fingerprint"].nunique() == len(out)


def test_top_ngrams_hand_example(ray_session):
    import ray.data

    from nifi_processors_ray.ops.text import _bigram_partials

    t = pa.table(
        {
            "text": pa.array(
                ["the cat sat", "the cat ran", "dog", None]  # 1-token + null docs
            )
        }
    )
    partial = _bigram_partials(t).to_pandas().set_index("ngram")["n"].to_dict()
    # no cross-document bigrams ('sat the' must NOT appear), null → ''
    assert partial == {"the cat": 2, "cat sat": 1, "cat ran": 1}


def test_top_ngrams_matches_sql(con):
    from nifi_processors_ray.ops.text import TOP_NGRAMS_SQL, top_ngrams

    got = top_ngrams(SF_DIR).to_pandas()
    want = con.sql(TOP_NGRAMS_SQL).df()
    assert len(got) == len(want) == 20
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns].reset_index(drop=True), check_dtype=False
    )


def test_text_redact_hand_cases():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the fast customer key order",
                    None,  # null text → empty doc, zero redactions
                    "key keyring customerx customer",  # word boundaries only
                    "no match here",
                ]
            ),
        }
    )
    out = T.text_redact_batch(batch).to_pylist()
    assert out[0]["redacted"] == "the fast [REDACTED] [REDACTED] order"
    assert out[0]["n_redactions"] == 2
    assert out[1] == {"doc_id": 1, "redacted": "", "n_redactions": 0}
    # substrings of larger words survive; whole words at string edges match
    assert out[2]["redacted"] == "[REDACTED] keyring customerx [REDACTED]"
    assert out[2]["n_redactions"] == 2
    assert out[3]["redacted"] == "no match here"
    assert out[3]["n_redactions"] == 0


def test_text_redact_matches_sql(con):
    got = T.text_redact(SF_DIR).to_pandas()
    want = con.sql(T.TEXT_REDACT_SQL).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
    assert (got["n_redactions"] > 0).any()  # the pattern actually fires


def test_trigrams_mask_document_boundaries():
    """A trigram must never span two documents: two 2-token docs yield
    zero trigrams even though the flat token array has 4 tokens."""
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b", "c d"])})
    grams, doc_of = T._trigrams(b)
    assert len(grams) == 0 and len(doc_of) == 0
    # one 4-token doc -> two trigrams, both attributed to doc index 0
    b2 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["a b c d"])})
    grams2, doc_of2 = T._trigrams(b2)
    assert grams2.to_pylist() == ["a b c", "b c d"]
    assert doc_of2.tolist() == [0, 0]


def test_decontaminate_matches_sql(con):
    got = T.decontaminate(SF_DIR).to_pandas()
    want = con.sql(T.DECONTAMINATE_SQL).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
    assert len(got) > 0
    # benchmark docs themselves are never flagged
    assert (got["doc_id"] % T.DECONTAM_MOD != 0).all()


# ---------------------------------------------------------------------------
# doc_chunks: overlapping-window chunking
# ---------------------------------------------------------------------------


def test_doc_chunks_window_invariants(ray_session):
    from nifi_processors_ray.ops import text as T

    df = T.doc_chunks("/root/testdata/sf0.001").to_pandas()
    assert list(df.columns) == ["doc_id", "chunk_idx", "chunk_text", "n_chunk_chars"]
    # every chunk ≤ size; with stride < size the last ceil(size/stride)
    # = 2 chunks of a doc may be truncated, every earlier one is full
    assert (df["n_chunk_chars"] <= T.CHUNK_SIZE).all()
    last = df.groupby("doc_id")["chunk_idx"].transform("max")
    assert (df.loc[df["chunk_idx"] < last - 1, "n_chunk_chars"] == T.CHUNK_SIZE).all()
    # chunk_idx is dense 0..k per doc
    g = df.groupby("doc_id")["chunk_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # consecutive chunks overlap by size - stride characters
    a = df[(df.doc_id == df.doc_id.iloc[0]) & (df.chunk_idx == 0)]["chunk_text"].iloc[0]
    b = df[(df.doc_id == df.doc_id.iloc[0]) & (df.chunk_idx == 1)]
    if len(b):
        assert a[T.CHUNK_STRIDE:] == b["chunk_text"].iloc[0][: T.CHUNK_SIZE - T.CHUNK_STRIDE]


def test_doc_chunks_null_and_empty_text(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from nifi_processors_ray.ops import text as T

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["abc", None, ""], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = T.doc_chunks(str(tmp_path)).to_pandas()
    # null and empty text yield NO chunks (the twin's join predicate)
    assert df["doc_id"].tolist() == [1]
    assert df["chunk_text"].tolist() == ["abc"]
