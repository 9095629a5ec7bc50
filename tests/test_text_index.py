"""Inverted text index: build-once posting lists, bucket-pruned search."""

import os

import pyarrow as pa
import pytest

from nifi_processors_ray.pipelines.text_index import (
    _bucket_of,
    build_text_index,
    search_text_index,
)
from nifi_processors_ray.synth import write_changelog_from_events

from test_replay_e2e import SF_DIR, make_engine

TERMS = ["click", "purchase"]


@pytest.fixture(scope="module")
def lake_and_index(tmp_path_factory):
    log = str(tmp_path_factory.mktemp("log"))
    write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(str(tmp_path_factory.mktemp("lake")), log)
    eng.replay()
    idx = str(tmp_path_factory.mktemp("idx"))
    receipt = build_text_index(eng.final_state(), idx, num_buckets=16)
    return eng, idx, receipt


def _scan_oracle(eng, terms):
    df = eng.final_state().to_pandas()
    want = {}
    for conv, text in zip(df["conv_id"], df["text"]):
        toks = (text or "").lower().split(" ")
        hits = sum(toks.count(t) for t in terms)
        if hits:
            want[conv] = want.get(conv, 0) + hits
    return want


def test_search_matches_full_scan(lake_and_index):
    eng, idx, receipt = lake_and_index
    assert receipt["rows_written"] > 0
    got = {
        r["conv_id"]: r["n_hits"] for r in search_text_index(idx, TERMS).take_all()
    }
    assert got == _scan_oracle(eng, TERMS)


def test_search_reads_only_term_buckets(lake_and_index):
    """The point of the index: a query touches ≤|terms| of the buckets."""
    _, idx, _ = lake_and_index
    buckets = {_bucket_of(t, 16) for t in TERMS}
    assert len(buckets) <= len(TERMS) < 16
    # and single-term search over a term absent from the corpus is empty
    assert search_text_index(idx, ["zzz-not-a-token"]).count() == 0


def test_build_is_resumable_noop(lake_and_index):
    eng, idx, _ = lake_and_index
    again = build_text_index(eng.final_state(), idx, num_buckets=16)
    assert again["rows_written"] == 0 and again["skipped"] == 16
    # the index still serves identical results
    got = {
        r["conv_id"]: r["n_hits"] for r in search_text_index(idx, TERMS).take_all()
    }
    assert got == _scan_oracle(eng, TERMS)
