"""Vector aggregation vs DuckDB oracle + centroid finish."""

import duckdb
import numpy as np
import pandas as pd

from nifi_processors_ray.ops import vectors as V

SF_DIR = "/root/testdata/sf0.001"


def test_label_vector_sums_matches_sql():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    got = V.label_vector_sums(SF_DIR).to_pandas()
    want = con.sql(V.LABEL_VECTOR_SUMS_SQL).df()
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_centroids_match_numpy():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    emb = np.asarray(t.column("embedding").combine_chunks().flatten()).reshape(
        t.num_rows, -1
    )
    labels = np.asarray(t.column("label"))
    got = V.label_centroids(SF_DIR)
    for row in got.to_pylist():
        exact = np.floor(emb[labels == row["label"]].astype(np.float64) * V.QUANT).sum(
            axis=0
        ) / (V.QUANT * (labels == row["label"]).sum())
        np.testing.assert_allclose(np.asarray(row["centroid"]), exact, rtol=1e-12)
