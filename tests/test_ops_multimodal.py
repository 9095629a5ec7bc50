"""Binary-media plumbing: header framing, actor-pool decode, SQL twin."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from nifi_processors_ray.ops import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


def test_media_features_matches_sql():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = M.media_features(SF_DIR, concurrency=2).to_pandas()
    want = con.sql(M.MEDIA_FEATURES_SQL).df()
    pd.testing.assert_frame_equal(
        got[want.columns].reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_attach_media_frames_payload():
    batch = pa.table(
        {
            "doc_id": pa.array([5], pa.int64()),
            "text": pa.array(["hello"]),
            "n_chars": pa.array([5], pa.int64()),
        }
    )
    media = M.attach_media(batch).column("media")[0].as_py()
    assert media[:4] == M.MEDIA_MAGIC
    assert media[M.HEADER_LEN:] == b"hello"
    w, h, f = M.MediaFeatureExtractor()._decode(media)
    assert (w, h, f) == ((5 * 7) % 1024 + 16, (5 * 3) % 768 + 16, 5 % 24 + 1)


def test_decoder_rejects_foreign_container():
    ex = M.MediaFeatureExtractor()
    if ex._codec == "stub":
        with pytest.raises(NotImplementedError):
            ex._decode(b"RIFFxxxxWEBP")


def test_sha_digest_stable():
    batch = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["abc"]),
            "n_chars": pa.array([3], pa.int64()),
        }
    )
    ex = M.MediaFeatureExtractor(digest=True)  # digest is the opt-in lineage path
    out1 = ex(M.attach_media(batch)).to_pylist()[0]
    out2 = ex(M.attach_media(batch)).to_pylist()[0]
    assert out1["sha1_16"] == out2["sha1_16"]
    assert out1["n_bytes"] == 3 + M.HEADER_LEN
    # the default (feature) path is fully vectorized and skips the digest
    assert "sha1_16" not in M.MediaFeatureExtractor()(M.attach_media(batch)).column_names
