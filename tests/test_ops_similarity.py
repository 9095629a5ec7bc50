"""Similarity search vs DuckDB exact oracle + recall bounds."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from nifi_processors_ray.ops import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return c


def test_knn_brute_matches_sql(con):
    got = S.knn_brute(SF_DIR, k=10, n_queries=8).to_pandas()
    want = con.sql(S.KNN_BRUTE_SQL_TEMPLATE.format(n_queries=8, k=10)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[got.columns].reset_index(drop=True),
        check_dtype=False,
    )


def test_knn_brute_excludes_self_and_ranks_dense():
    got = S.knn_brute(SF_DIR, k=5, n_queries=4).to_pandas()
    assert (got["query_id"] != got["neighbor_id"]).all()
    for qid, grp in got.groupby("query_id"):
        assert list(grp["rank"]) == [1, 2, 3, 4, 5]


def test_knn_ivf_recall_against_brute():
    brute = S.knn_brute(SF_DIR, k=10, n_queries=8).to_pandas()
    ivf = S.knn_ivf(SF_DIR, k=10, n_queries=8, n_cells=16, nprobe=4).to_pandas()
    b = set(map(tuple, brute[["query_id", "neighbor_id"]].values))
    i = set(map(tuple, ivf[["query_id", "neighbor_id"]].values))
    recall = len(b & i) / len(b)
    assert recall >= 0.6, f"IVF recall {recall} below floor"


def test_centroids_deterministic():
    c1 = S.train_centroids(SF_DIR, n_cells=8)
    c2 = S.train_centroids(SF_DIR, n_cells=8)
    np.testing.assert_array_equal(c1, c2)
