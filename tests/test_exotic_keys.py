"""Exotic conv_id keys through the full CDC path.

The reference keys records by an opaque partition key string
(``producer/PutKinesisStream.java`` partition-key attribute); nothing
in its contract restricts the alphabet.  This engine's analog is
``conv_id``: it feeds the salted hash partitioner, the merge sort, the
point-lookup pruning, and ``forget`` — all of which must treat the key
as OPAQUE BYTES.  Pinned here: empty string, astral-plane code points
(incl. U+10FFFF), combining marks where NFC != NFD (must stay DISTINCT
— byte equality, never normalization), SQL/JSON-looking strings,
control characters, and a multi-KB key, replayed cow and mor, equal to
the naive oracle; point lookup and forget on the astral key."""

import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.schema import CHANGELOG_SCHEMA

ASTRAL = "convo-\U0001f980\U0001d54f-\U0010ffff"
NFC = "caf\u00e9"                        # e-acute precomposed
NFD = unicodedata.normalize("NFD", NFC)  # e + combining acute: a DIFFERENT key
KEYS = [
    "",                      # empty string is a legal key (only null rejects)
    ASTRAL,
    NFC,
    NFD,
    "null",                  # the string, not the value
    'k"; DROP TABLE--',      # quoting/injection-looking bytes
    "line\nbreak\tand\rctl", # control chars survive parquet + hash + sort
    "k" * 4096,              # multi-KB key
]


def _log(tmp_path):
    rows = []
    seq = 0
    for k in KEYS:
        for turn in (0, 1):
            seq += 1
            rows.append((seq, "I", k, turn, "user", f"first {turn} of {k[:8]!r}"))
    # updates + a delete, interleaved so LWW has work per exotic key
    for k in KEYS:
        seq += 1
        rows.append((seq, "U", k, 0, "user", f"updated 0 of {k[:8]!r}"))
    seq += 1
    rows.append((seq, "D", ASTRAL, 1, None, None))
    seq += 1
    rows.append((seq, "I", None, 0, "user", "null key -> rejected"))
    t = pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "conv_id": pa.array([r[2] for r in rows], pa.string()),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": pa.array([r[4] for r in rows], pa.string()),
            "text": pa.array([r[5] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([None] * len(rows), pa.timestamp("us")),
            "batch_id": pa.array([f"b{r[0]}" for r in rows], pa.string()),
        }
    ).cast(CHANGELOG_SCHEMA)
    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(t, str(log / "a.parquet"))
    return str(log), t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_exotic_keys_replay_matches_oracle(ray_session, tmp_path, mode):
    log, t = _log(tmp_path)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / f"lake_{mode}"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            epoch_events=9,  # several epochs: updates cross epoch boundaries
            merge_mode=mode,
        )
    )
    eng.replay()
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(t).to_pandas().reset_index(drop=True)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    # NFC and NFD stayed distinct keys with their own rows
    assert (got["conv_id"] == NFC).sum() == 2
    assert (got["conv_id"] == NFD).sum() == 2
    # the astral key's turn 1 was tombstoned, turn 0 updated
    astral_rows = got[got["conv_id"] == ASTRAL]
    assert astral_rows["turn_idx"].tolist() == [0]
    assert astral_rows["text"].iloc[0].startswith("updated 0")
    # null-key event was rejected, not silently dropped or applied
    rej = eng.rejected().to_pandas()
    assert (rej["reject_reason"] == "null_conv_id").sum() == 1


def test_exotic_key_point_lookup_and_forget(ray_session, tmp_path):
    log, t = _log(tmp_path)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_pl"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            epoch_events=100,
        )
    )
    eng.replay()
    hit = eng.read_conversation(ASTRAL).to_pandas()
    assert hit["conv_id"].tolist() == [ASTRAL]
    empty_key = eng.read_conversation("").to_pandas()
    assert set(empty_key["conv_id"]) == {""}
    assert len(empty_key) == 2
    eng.forget_conversations([ASTRAL])
    assert eng.read_conversation(ASTRAL).count() == 0
    # forgetting one exotic key never touches its NFC/NFD neighbors
    assert eng.read_conversation(NFD).count() == 2
