"""Unicode-injection parity: the text family vs its DuckDB twins on a
corpus salted with emoji, CJK, RTL, astral-plane letters, combining
accents and regex metacharacters.

Both sides operate on CODEPOINTS (Arrow utf8 kernels vs DuckDB string
functions), so parity must hold — this suite pins that contract the
same way the null-injection suites pin the null contracts.  Divergence
classes this would catch: byte-vs-codepoint slicing, RE2-vs-DuckDB
regex class semantics on non-ASCII, locale-dependent casing, and hash
routing over non-UTF8-normalized text.
"""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

SRC = "/root/testdata/sf0.001"

UNI_TEXTS = [
    "héllo wörld 🦜 naïve café",
    "日本語 テキスト 処理 エンジン データ",
    "emoji 😀😀 😀😀 test 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math 𝕏",
    "mixed اللغة العربية text здесь",
    "regex specials .*+?[](){}|^$\\ end",
    "zero​width and non breaking spaces",
    "tabs\tand  double  spaces   here",
    "ACCENTS ÉÀÜ upper ß sharp",
]

UNICODE_TEXT_TARGETS = [
    "text_stats", "lang_id", "token_counts", "top_ngrams", "text_redact",
    "doc_repetition", "doc_top_terms", "corpus_source_rollup", "exact_dedup",
    "doc_chunks", "decontaminate", "corpus_clean", "training_mix",
    "token_pack", "corpus_shuffle_shards", "jaccard_dup_pairs",
    "dedup_clusters", "dedup_incremental",
]


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("unicodesf"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = t.column("text").to_pylist()
    for i in range(len(texts)):
        if i % 13 == 0 and texts[i] is not None:
            texts[i] = UNI_TEXTS[i % len(UNI_TEXTS)] + " " + texts[i][:40]
    idx = t.schema.get_field_index("text")
    t = t.set_column(idx, "text", pa.array(texts, pa.string()))
    pq.write_table(t, os.path.join(tmp, "documents.parquet"))
    return tmp


@pytest.fixture(scope="module")
def unicode_con(unicode_sf):
    con = duckdb.connect()
    for v in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{unicode_sf}/{v}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", UNICODE_TEXT_TARGETS)
def test_text_family_unicode_parity(ray_session, unicode_sf, unicode_con, name):
    res = entry.queries()[name](unicode_sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ot = unicode_con.sql(entry.oracle_sql()[name]).df()
    if len(df) == 0 and len(ot) == 0:
        return
    df = df.sort_index(axis=1).sort_values(list(sorted(df.columns))).reset_index(drop=True)
    ot = ot.sort_index(axis=1).sort_values(list(sorted(ot.columns))).reset_index(drop=True)
    assert df.equals(ot), f"{name}:\n{df.head()}\nvs oracle\n{ot.head()}"


def test_props_extract_malformed_json_parity(ray_session, tmp_path):
    """events_props_extract == its DuckDB twin when the props column
    carries malformed/unexpected JSON (truncated objects, bare strings,
    arrays, wrong value types, empties, nulls) — both sides must agree
    on what counts as extractable."""
    import pyarrow.parquet as pq2

    src = pq2.read_table(os.path.join(SRC, "events.parquet"))
    props = src.column("props").to_pylist()
    bad = ['{"k": }', 'not json', '', '{"k": "str"}', '{"K": 5}', '[1,2,3]',
           '{"k": 1.5}', '{"k": null}', '{"k": 87, "extra": 1}', '{ }',
           '{"k":-3}', None]
    for i in range(len(props)):
        if i % 9 == 0:
            props[i] = bad[i % len(bad)]
    i = src.schema.get_field_index("props")
    src = src.set_column(i, "props", pa.array(props, pa.string()))
    tmp = str(tmp_path)
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), tmp)
    pq2.write_table(src, os.path.join(tmp, "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')")
    got = entry.queries()["events_props_extract"](tmp)
    df = got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)
    ot = con.sql(entry.oracle_sql()["events_props_extract"]).df()
    con.close()
    df = df.sort_index(axis=1).sort_values(list(sorted(df.columns))).reset_index(drop=True)
    ot = ot.sort_index(axis=1).sort_values(list(sorted(ot.columns))).reset_index(drop=True)
    assert df.equals(ot)
