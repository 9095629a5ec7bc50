"""Sparse sequence numbers: exactly-once replay over a changelog whose
seqs have large gaps (upstream compaction / per-shard interleaves).

Epoch windows are SEQ RANGES, so a sparse stream yields smaller epochs
— the semantics that must hold regardless: converged state equals the
oracle, and a resumed engine finds nothing left (the at-most-once
watermark guard works on gap boundaries too).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
from nifi_processors_ray.synth import write_generated_changelog


def test_seq_gap_replay_matches_oracle(ray_session, tmp_path):
    dense = str(tmp_path / "log0")
    write_generated_changelog(dense, 3000, files=3, n_convs=60)
    log = tmp_path / "log"
    log.mkdir()
    # drop every 3rd row AND stretch seqs 7× — big ordered gaps
    for f in sorted(os.listdir(dense)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(dense, f))
        t = t.filter(pa.array(np.arange(t.num_rows) % 3 != 0))
        i = t.schema.get_field_index("seq")
        t = t.set_column(
            i, "seq",
            pa.array((t.column("seq").to_numpy(zero_copy_only=False) * 7).astype("int64")),
        )
        pq.write_table(t, str(log / f))

    def make():
        return CdcEngine(
            EngineConfig(
                lake_dir=str(tmp_path / "lake"),
                changelog_paths=(str(log),),
                num_partitions=8,
                salt_factor=2,
                epoch_events=400,
            )
        )

    eng = make()
    eng.replay()
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    tables = [
        pq.read_table(str(log / f)) for f in sorted(os.listdir(log)) if f.endswith(".parquet")
    ]
    want = apply_changelog(
        pa.concat_tables([align_to_schema(t, CHANGELOG_SCHEMA) for t in tables])
    ).to_pandas()
    assert len(got) == len(want)
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["text"].values == want["text"].values).all()
    assert make().replay() == []  # resume finds nothing — idempotent


def test_duplicate_seq_retry_files_converge_to_oracle(ray_session, tmp_path):
    """At-least-once upstream delivery: a producer retry re-appends a
    whole file's rows verbatim (same seqs, same payloads).  The
    converged state must equal the UNDUPLICATED oracle — duplicate
    upserts are idempotent under LWW (same key, same seq, same text),
    and the watermark guard absorbs cross-epoch replays."""
    dense = str(tmp_path / "log0")
    write_generated_changelog(dense, 2400, files=3, n_convs=50)
    log = tmp_path / "log"
    log.mkdir()
    files = sorted(f for f in os.listdir(dense) if f.endswith(".parquet"))
    for f in files:
        pq.write_table(pq.read_table(os.path.join(dense, f)), str(log / f))
    t = pq.read_table(os.path.join(dense, files[1]))
    pq.write_table(t, str(log / "zz-retry-dup.parquet"))

    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(str(log),),
            num_partitions=8,
            salt_factor=2,
            epoch_events=500,
        )
    )
    eng.replay()
    got = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = apply_changelog(
        pa.concat_tables(
            [align_to_schema(pq.read_table(os.path.join(dense, f)), CHANGELOG_SCHEMA) for f in files]
        )
    ).to_pandas()
    assert len(got) == len(want)
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["text"].values == want["text"].values).all()
