"""Dedup operators vs brute-force references on crafted corpora."""

import itertools

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from nifi_processors_ray.ops import dedup as D

SF_DIR = "/root/testdata/sf0.001"


def _docs(texts: list[str]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_exact_dedup_matches_sql():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = D.exact_dedup(SF_DIR).to_pandas()
    want = con.sql(D.EXACT_DEDUP_SQL).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_exact_dedup_keeps_first_doc_of_each_text():
    ds = _docs(["x y z", "a b", "x y z", "a b", "unique"])
    # run the pipeline pieces directly on the crafted table
    dd = (
        ds.map_batches(D._add_text_hash, batch_format="pyarrow")
        .sort("__h")
        .map_batches(D._first_per_text, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(dd["doc_id"]) == [0, 1, 4]


def test_minhash_estimates_track_exact_jaccard():
    t0 = " ".join(f"w{i}" for i in range(40))
    t1 = " ".join(f"w{i}" for i in range(40) if i != 17)  # drop one token
    t2 = " ".join(f"v{i}" for i in range(40))  # disjoint
    pairs = D.minhash_dup_pairs(_docs([t0, t1, t2]), threshold=0.3).to_pandas()
    assert set(map(tuple, pairs[["doc_a", "doc_b"]].values)) == {(0, 1)}
    est = pairs["est_jaccard"].iloc[0]
    exact = D.exact_jaccard(t0, t1)
    assert abs(est - exact) < 0.2  # 64-perm estimator tolerance


def test_minhash_finds_planted_dups_in_augmented_corpus():
    pairs = D.minhash_dup_pairs(
        D.augmented_documents(SF_DIR), threshold=0.5
    ).to_pandas()
    # every planted near-copy (doc_id % 10 == 0) must pair with its source
    planted = {
        (i, i + D.AUG_ID_OFFSET)
        for i in range(0, 500, 10)
    }
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    missing = planted - found
    assert len(missing) <= len(planted) * 0.05, f"missed {len(missing)} planted pairs"


def test_simhash_finds_low_hamming_pairs():
    # identical docs → hamming 0; the banding guarantees hamming ≤ bands-1
    t0 = " ".join(f"tok{i}" for i in range(60))
    pairs = D.simhash_dup_pairs(_docs([t0, t0, "other words here"])).to_pandas()
    assert set(map(tuple, pairs[["doc_a", "doc_b"]].values)) == {(0, 1)}
    assert pairs["hamming"].iloc[0] == 0


def test_simhash_signature_is_order_insensitive_bagwise():
    # simhash is a bag-of-tokens sketch: permuting tokens keeps the signature
    a = "alpha beta gamma delta epsilon"
    b = "epsilon delta gamma beta alpha"
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array([a, b])})
    sigs = D.simhash_signatures(t).to_pylist()
    assert sigs[0]["simhash"] == sigs[1]["simhash"]


def test_embedding_dup_pairs_finds_planted_copies():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((50, 32))
    x[41] = x[3] * 2.0  # same direction → cosine 1
    x[42] = x[3] + rng.standard_normal(32) * 0.01  # near-copy
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(x.reshape(-1)), 32
                ),
            }
        )
    )
    pairs = D.embedding_dup_pairs(emb, threshold=0.98).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert {(3, 41), (3, 42)} <= found
    # random pairs must not appear at this threshold
    assert all(a in (3, 41, 42) and b in (3, 41, 42) for a, b in found)


def test_bucket_cap_bounds_quadratic_blowup():
    # a degenerate bucket (many identical docs) must not hang: capped
    texts = ["same text here every time"] * (D.MAX_BUCKET * 3)
    pairs = D.minhash_dup_pairs(_docs(texts), threshold=0.9).to_pandas()
    assert len(pairs) <= D.MAX_BUCKET * (D.MAX_BUCKET - 1) // 2
    assert len(pairs) > 0


def test_jaccard_dup_pairs_exact_verification():
    """Candidate-then-verify: every output pair's jaccard is the EXACT
    shingle jaccard and clears the threshold; planted near-copies found."""
    import ray.data

    from nifi_processors_ray.ops.dedup import (
        AUG_ID_OFFSET,
        augmented_documents,
        exact_jaccard,
        jaccard_dup_pairs,
    )

    docs = augmented_documents(SF_DIR)
    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    pairs = jaccard_dup_pairs(docs, threshold=0.5).to_pandas()
    assert len(pairs) > 0
    for _, p in pairs.iterrows():
        j = exact_jaccard(texts[p["doc_a"]], texts[p["doc_b"]])
        assert abs(j - p["jaccard"]) < 1e-12  # exact, not estimated
        assert j >= 0.5
    # the planted near-copies (doc, doc+OFFSET) are recovered
    planted = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"]) if b == a + AUG_ID_OFFSET}
    assert len(planted) >= 0.8 * sum(1 for d in texts if d >= AUG_ID_OFFSET)


def test_exact_jaccard_uncapped_on_large_duplicate_cluster():
    """Review regression: a duplicate cluster LARGER than MAX_BUCKET must
    yield the full C(B,2) pair set from the EXACT op (max_bucket=None)
    and a complete cluster — the estimator op stays capped by design."""
    B = D.MAX_BUCKET + 16
    texts = ["same exact text repeated here ok"] * B + ["something else entirely now"]
    pairs = D.jaccard_dup_pairs(_docs(texts), threshold=0.5).to_pandas()
    assert len(pairs) == B * (B - 1) // 2
    clusters = D.dedup_clusters(_docs(texts)).to_pandas()
    assert len(clusters) == B and clusters["cluster_id"].nunique() == 1
    capped = D.minhash_dup_pairs(_docs(texts), threshold=0.5).to_pandas()
    assert len(capped) <= D.MAX_BUCKET * (D.MAX_BUCKET - 1) // 2


def test_dedup_clusters_transitive_components():
    """A chain a~b~c (a and c NOT directly similar enough is fine) must
    fold into ONE cluster labelled by the min doc id."""
    base = " ".join(f"w{i}" for i in range(40))
    n1 = " ".join(f"w{i}" for i in range(40) if i != 3)
    n2 = " ".join(f"w{i}" for i in range(40) if i not in (3, 17))
    other = " ".join(f"z{i}" for i in range(40))
    other2 = " ".join(f"z{i}" for i in range(40) if i != 9)
    ds = _docs([base, n1, n2, other, other2])
    got = D.dedup_clusters(ds).to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [0, 1, 2, 3, 4]
    assert list(got["cluster_id"]) == [0, 0, 0, 3, 3]


def test_dedup_clusters_empty_on_no_pairs():
    ds = D.dedup_clusters(_docs(["aa bb cc dd ee ff", "zz yy xx ww vv uu"]))
    assert ds.count() == 0
    assert ds.schema().names == ["doc_id", "cluster_id"]


def test_jaccard_distributed_verify_multipair_and_null_text():
    """The distributed verify handles a doc in SEVERAL pairs (its text is
    emitted once per membership) and null text (treated as '')."""
    base = " ".join(f"w{i}" for i in range(30))
    near1 = " ".join(f"w{i}" for i in range(30) if i != 5)
    near2 = " ".join(f"w{i}" for i in range(30) if i != 20)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array([base, near1, near2, None, None]),
            }
        )
    )
    pairs = D.jaccard_dup_pairs(ds, threshold=0.5).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    # doc 0 participates in pairs with 1 AND 2; 1-2 are near each other
    # too; the two null docs are both '' → jaccard 1.0
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} == found
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for _, r in pairs.iterrows()}
    assert jac[(3, 4)] == 1.0
    for (a, b), j in jac.items():
        texts = {0: base, 1: near1, 2: near2, 3: "", 4: ""}
        assert j == D.exact_jaccard(texts[a], texts[b])


# ---------------------------------------------------------------------------
# incremental exact dedup against the persistent hash-bucketed index
# ---------------------------------------------------------------------------


def test_dedup_incremental_prunes_bucket_reads(ray_session, tmp_path):
    """The probe must read only the new batch's hash buckets — the whole
    point of the persistent index at 100 TB."""
    import numpy as np

    from nifi_processors_ray.functions.hashing import hash_strings_u64
    from nifi_processors_ray.ops import dedup as D
    from nifi_processors_ray.sources.reader import read_parquet_fanout

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    out = D.dedup_incremental(sf, index_dir=idx).to_pandas()
    assert len(out) > 0
    # dup resubmissions matched, fresh docs did not
    assert out[out.new_id >= D._INCR_FRESH_OFFSET]["dup_of"].isna().all()
    assert out[out.new_id < D._INCR_FRESH_OFFSET]["dup_of"].notna().all()

    docs = read_parquet_fanout(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    new_docs = docs.map_batches(D._derive_new_docs, batch_format="pyarrow")
    hashes = np.concatenate(
        [
            hash_strings_u64(b.column("text")).astype(np.int64)
            for b in new_docs.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
    )
    buckets = D._probe_buckets(hashes, D._INCR_INDEX_BUCKETS)
    assert len(buckets) < 0.6 * D._INCR_INDEX_BUCKETS, (
        f"probe touches {len(buckets)}/{D._INCR_INDEX_BUCKETS} buckets — no pruning"
    )


def test_dedup_incremental_index_rebuild_is_noop(ray_session, tmp_path):
    import os

    from nifi_processors_ray.ops import dedup as D

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx2")
    a = D.dedup_incremental(sf, index_dir=idx).to_pandas()
    mtimes = {}
    for root, _, files in os.walk(idx):
        for f in files:
            p = os.path.join(root, f)
            mtimes[p] = os.stat(p).st_mtime_ns
    b = D.dedup_incremental(sf, index_dir=idx).to_pandas()
    assert a.equals(b)
    for p, t in mtimes.items():
        assert os.stat(p).st_mtime_ns == t, f"index file rewritten on resume: {p}"
