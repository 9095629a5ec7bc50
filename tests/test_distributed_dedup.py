"""Distributed dedup paths (round 5): the over-driver-budget branches of
jaccard_dup_pairs (Bloom-pruned sort-exchange membership join instead of
the ray.put index) and dedup_clusters (hash-min label propagation instead
of the driver union-find) must produce EXACTLY the broadcast/driver-path
results — pinned by forcing driver_limit=0 at tiny scale and comparing
against both the fast path and the DuckDB twins."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from nifi_processors_ray.ops.dedup import (
    DEDUP_CLUSTERS_SQL,
    JACCARD_DUP_PAIRS_SQL,
    _components_min_label,
    _distributed_components,
    augmented_documents,
    dedup_clusters,
    jaccard_dup_pairs,
)

SF = "/root/testdata/sf0.001"


def _sorted_df(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_distributed_components_matches_union_find():
    """Chain, clique, singleton-pair and shared-min components — the
    propagation must converge to the same min-id labels as union-find."""
    # components: chain 1-2-3-4 (diameter 3), clique {10,11,12},
    # pair {100, 7}, star {20,21,22,23}
    a = np.array([2, 3, 4, 10, 10, 11, 100, 20, 20, 20], dtype=np.int64)
    b = np.array([1, 2, 3, 11, 12, 12, 7, 21, 22, 23], dtype=np.int64)
    ids, labels = _components_min_label(a, b)
    pairs = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                  "jaccard": pa.array(np.ones(len(a)))})
    )
    got = _distributed_components(pairs).to_pandas()
    assert got.doc_id.tolist() == ids.tolist()
    assert got.cluster_id.tolist() == labels.tolist()
    # ground truth by hand
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 7: 7,
            100: 7, 20: 20, 21: 20, 22: 20, 23: 20}
    assert dict(zip(got.doc_id, got.cluster_id)) == want


def test_distributed_components_long_chain_and_huge_ids():
    """Round-5 review regressions: (a) a chain DEEPER than the round cap
    must still converge (pointer-jump collapses it in O(log) rounds —
    one-hop propagation needed diameter rounds and raised at 65);
    (b) node ids above 2^53 must survive exactly (np.asarray of the
    null-bearing 'other' column degraded the whole column to float64,
    rounding 64-bit hash ids)."""
    base = (1 << 60) + 1  # far past float64's 2^53 integer range
    n = 130  # diameter 129 > the 64-round cap
    ids = base + np.arange(n, dtype=np.int64)
    a = ids[1:]
    b = ids[:-1]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "jaccard": pa.array(np.ones(n - 1)),
            }
        )
    )
    got = _distributed_components(pairs).to_pandas()
    assert got.doc_id.tolist() == ids.tolist()  # ids exact, no rounding
    assert set(got.cluster_id) == {base}  # one component, min-id label


def test_jaccard_distributed_large_string_corpus():
    """A large_string text column (pyarrow's >2GB-column encoding) must
    take the distributed membership join without schema-union crashes,
    and match the regular-string result."""
    import pyarrow.compute as pc

    docs_t = (
        augmented_documents(SF)
        .to_pandas()
        .pipe(pa.Table.from_pandas, preserve_index=False)
    )
    i = docs_t.schema.get_field_index("text")
    big = docs_t.set_column(i, "text", pc.cast(docs_t.column("text"), pa.large_string()))
    fast = _sorted_df(jaccard_dup_pairs(ray.data.from_arrow(docs_t)))
    dist = _sorted_df(jaccard_dup_pairs(ray.data.from_arrow(big), driver_limit=0))
    assert dist.equals(fast)


def test_jaccard_distributed_path_matches_broadcast_and_oracle():
    docs = augmented_documents(SF)
    fast = _sorted_df(jaccard_dup_pairs(docs))
    dist = _sorted_df(jaccard_dup_pairs(augmented_documents(SF), driver_limit=0))
    assert dist.equals(fast)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(JACCARD_DUP_PAIRS_SQL).df()
    cols = sorted(want.columns)
    assert dist.equals(want[cols].sort_values(cols).reset_index(drop=True))
    assert len(dist) > 0  # non-vacuous: the fixture has near-dups


def test_clusters_distributed_path_matches_driver_and_oracle():
    fast = _sorted_df(dedup_clusters(augmented_documents(SF)))
    dist = _sorted_df(dedup_clusters(augmented_documents(SF), driver_limit=0))
    assert dist.equals(fast)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(DEDUP_CLUSTERS_SQL).df()
    cols = sorted(want.columns)
    assert dist.equals(want[cols].sort_values(cols).reset_index(drop=True))
    assert len(dist) > 0


def test_distributed_paths_handle_null_text_docs():
    """Null-text docs are jaccard-1.0 duplicates of each other (family
    contract: coalesce(text,'') on both sides) — the Bloom-pruned join
    must ship their empty texts like any other member."""
    base = augmented_documents(SF)

    def null_some(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(b.column("doc_id").combine_chunks())
        mask = pa.array(ids % 97 == 3)
        text = pc.if_else(mask, pa.nulls(b.num_rows, pa.string()), b.column("text"))
        return b.set_column(b.schema.get_field_index("text"), "text", text)

    docs = base.map_batches(null_some, batch_format="pyarrow")
    fast = _sorted_df(jaccard_dup_pairs(docs))
    dist = _sorted_df(
        jaccard_dup_pairs(
            augmented_documents(SF).map_batches(null_some, batch_format="pyarrow"),
            driver_limit=0,
        )
    )
    assert dist.equals(fast) and len(dist) > 0
