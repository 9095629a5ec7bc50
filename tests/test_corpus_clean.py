"""Composed corpus-hygiene pipeline vs its SQL oracle + hand case."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from nifi_processors_ray.pipelines import corpus as C

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_clean_matches_sql():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = C.corpus_clean(SF_DIR).to_pandas()
    want = con.sql(C.CORPUS_CLEAN_SQL).df()
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert 0 < len(got) < 500  # the gate actually rejects something


def test_quality_filter_hand_cases():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            # 0: long + low stopword → kept; 1: too short; 2: all stopwords
            "text": pa.array(
                [
                    " ".join(f"w{i}" for i in range(25)),
                    "short doc here",
                    " ".join(["the a"] * 12),
                ]
            ),
        }
    )
    out = C._quality_filter(batch).to_pylist()
    assert [r["doc_id"] for r in out] == [0]
    assert out[0]["n_tokens"] == 25
