"""CSV change-stream ingest surface: the tailer consumes delimited-text
segments with the same window, validation, schema-evolution and
convergence semantics as parquet — including the null-vs-empty-string
payload distinction validate's reject route depends on (unquoted empty
field = null, quoted "" = empty string)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import (
    export_changelog_csv,
    write_changelog_from_events,
)

SF_DIR = "/root/testdata/sf0.001"


def _engine(tmp_path, name, log_dirs):
    return CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / name),
            changelog_paths=tuple(log_dirs),
            num_partitions=8,
            salt_factor=2,
            epoch_events=100_000,
        )
    )


@pytest.fixture(scope="module")
def logs(tmp_path_factory):
    base = tmp_path_factory.mktemp("csv_logs")
    pq_dir = str(base / "pq")
    write_changelog_from_events(SF_DIR, pq_dir, files=4)
    cs_dir = str(base / "cs")
    export_changelog_csv(pq_dir, cs_dir)
    return pq_dir, cs_dir


def test_csv_replay_matches_parquet_replay(ray_session, tmp_path, logs):
    pq_dir, cs_dir = logs
    a = _engine(tmp_path, "lake_pq", [pq_dir])
    b = _engine(tmp_path, "lake_cs", [cs_dir])
    a.replay()
    b.replay()
    fa = a.final_state(sort=True).to_pandas().reset_index(drop=True)
    fb = b.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert fa.equals(fb), "CSV replay diverged from parquet replay"
    ra = a.rejected().to_pandas().sort_values("seq").reset_index(drop=True)
    rb = b.rejected().to_pandas().sort_values("seq").reset_index(drop=True)
    assert ra.equals(rb), "CSV reject routing diverged"


def test_three_format_mixed_log_replays(ray_session, tmp_path, logs):
    """Segments split across parquet, JSONL and CSV in ONE log
    directory — every per-format window path and their union agree."""
    import shutil

    from nifi_processors_ray.synth import export_changelog_jsonl

    pq_dir, cs_dir = logs
    js_dir = str(tmp_path / "js")
    export_changelog_jsonl(pq_dir, js_dir)
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    pq_files = sorted(f for f in os.listdir(pq_dir) if f.endswith(".parquet"))
    for i, f in enumerate(pq_files):
        stem = f[: -len(".parquet")]
        if i % 3 == 0:
            shutil.copy(os.path.join(pq_dir, f), mixed / f)
        elif i % 3 == 1:
            shutil.copy(os.path.join(js_dir, stem + ".jsonl"), mixed / (stem + ".jsonl"))
        else:
            shutil.copy(os.path.join(cs_dir, stem + ".csv"), mixed / (stem + ".csv"))

    ref = _engine(tmp_path, "lake_ref", [pq_dir])
    mix = _engine(tmp_path, "lake_mix", [str(mixed)])
    ref.replay()
    mix.replay()
    fr = ref.final_state(sort=True).to_pandas().reset_index(drop=True)
    fm = mix.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert fr.equals(fm), "three-format mixed replay diverged"


def test_csv_null_vs_empty_payload_round_trip(tmp_path):
    """The lossless contract the CSV surface stands on: null text (a
    reject on non-deletes) and EMPTY text (a legal payload) survive the
    format hop distinctly, as do control characters, embedded
    newlines/quotes/commas, unicode and µs timestamps."""
    import pyarrow.csv as pacsv

    from nifi_processors_ray.sources.tailer import _csv_read_table

    t = pa.table(
        {
            "seq": pa.array([1, 2, 3, 4], pa.int64()),
            "op": pa.array(["I", "I", "U", "D"], pa.string()),
            "conv_id": pa.array(['c,"x"\n1', "c\x1f2", "é😀", "c4"], pa.string()),
            "turn_idx": pa.array([0, 1, None, 3], pa.int32()),
            "role": pa.array(["user", None, "assistant", None], pa.string()),
            "text": pa.array(["", None, "a,b\n\"q\"", "z"], pa.string()),
            "tool": pa.array([None, "search", None, None], pa.string()),
            "ts": pa.array([0, 1755555555123456, None, 42], pa.timestamp("us")),
            "batch_id": pa.array(["b1", "b1", "b2", "b2"], pa.string()),
        }
    )
    p = str(tmp_path / "seg.csv")
    pacsv.write_csv(t, p)
    back = _csv_read_table(p)
    for c in t.column_names:
        assert back.column(c).equals(t.column(c)), c
    # the distinction that matters downstream: row 1 empty text (valid
    # payload), row 2 null text (reject on a non-delete)
    assert back.column("text")[0].as_py() == ""
    assert not back.column("text")[1].is_valid


def test_csv_scan_bounds_and_window(tmp_path, logs):
    from nifi_processors_ray.sources import tailer

    pq_dir, cs_dir = logs
    files = [os.path.join(cs_dir, f) for f in sorted(os.listdir(cs_dir)) if f.endswith(".csv")]
    infos = tailer.scan_log(files)
    assert len(infos) == len(files)
    pq_infos = tailer.scan_log(
        [os.path.join(pq_dir, f) for f in sorted(os.listdir(pq_dir)) if f.endswith(".parquet")]
    )
    assert [(i.seq_min, i.seq_max) for i in infos] == [
        (i.seq_min, i.seq_max) for i in pq_infos
    ], "CSV seq bounds diverged from parquet footer stats"
    # schema evolution: the export keeps early tool-less segments tool-less
    assert "tool" not in infos[0].columns
    assert "tool" in infos[-1].columns


def test_csv_replay_with_embedded_newlines(ray_session, tmp_path):
    """Multi-line transcript text (quoted by the CSV writer) must replay
    identically to parquet — newlines_in_values is pinned on, so chunked
    parses of large segments cannot reject legal payloads."""
    import pyarrow.parquet as pq

    from nifi_processors_ray.schema import CHANGELOG_SCHEMA

    n = 600
    t = pa.table(
        {
            "seq": pa.array(range(n), pa.int64()),
            "op": pa.array(["I"] * n, pa.string()),
            "conv_id": pa.array([f"c{i % 7}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([i // 7 for i in range(n)], pa.int32()),
            "role": pa.array(["user", "assistant"] * (n // 2), pa.string()),
            "text": pa.array(
                [f"line one {i}\nline two, with comma\n\"quoted\" tail" for i in range(n)],
                pa.string(),
            ),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(range(n), pa.timestamp("us")),
            "batch_id": pa.array(["b"] * n, pa.string()),
        }
    ).cast(CHANGELOG_SCHEMA)
    pq_dir = tmp_path / "pq"
    pq_dir.mkdir()
    pq.write_table(t, str(pq_dir / "changelog-0.parquet"))
    cs_dir = str(tmp_path / "cs")
    export_changelog_csv(str(pq_dir), cs_dir)

    a = _engine(tmp_path, "lake_pq", [str(pq_dir)])
    b = _engine(tmp_path, "lake_cs", [cs_dir])
    a.replay()
    b.replay()
    fa = a.final_state(sort=True).to_pandas().reset_index(drop=True)
    fb = b.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert fa.equals(fb)
    assert fa["text"].str.contains("\n").all()


def test_csv_null_seq_rows_rejected_not_lost(ray_session, tmp_path):
    """A CSV row with an empty (unquoted) seq field is a null seq: the
    TRIM_HORIZON window must surface it to validate's reject route
    exactly once — same contract as the parquet path."""
    import pyarrow.csv as pacsv

    from nifi_processors_ray.synth import generate_changelog

    ch = generate_changelog(200, n_convs=10, invalid_frac=0.0)
    seqs = ch.column("seq").to_pylist()
    seqs[5] = None
    ch = ch.set_column(0, "seq", pa.array(seqs, pa.int64()))
    log = tmp_path / "log"
    log.mkdir()
    pacsv.write_csv(ch, str(log / "changelog-0.csv"))
    eng = _engine(tmp_path, "lake", [str(log)])
    eng.replay()
    rej = eng.rejected().to_pandas()
    assert (rej["reject_reason"] == "null_seq").sum() == 1
    # accounted exactly once even across a re-replay
    eng2 = _engine(tmp_path, "lake", [str(log)])
    eng2.replay()
    assert (eng2.rejected().to_pandas()["reject_reason"] == "null_seq").sum() == 1


def test_csv_tail_resume_across_engines(ray_session, tmp_path, logs):
    """Mid-stream stop + fresh-engine resume over a CSV log, with a new
    CSV segment landing between runs — convergence must equal the
    one-shot parquet replay (the watermark/offset machinery is
    format-agnostic)."""
    import shutil

    pq_dir, cs_dir = logs
    staged = tmp_path / "staged"
    staged.mkdir()
    cs_files = sorted(f for f in os.listdir(cs_dir) if f.endswith(".csv"))
    # start with all but the last segment
    for f in cs_files[:-1]:
        shutil.copy(os.path.join(cs_dir, f), staged / f)

    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_resume"),
            changelog_paths=(str(staged),),
            num_partitions=8,
            salt_factor=2,
            epoch_events=300,  # several epochs, stop after 2
        )
    )
    eng.replay(max_epochs=2)
    # the last segment arrives; a FRESH engine resumes from the manifest
    shutil.copy(os.path.join(cs_dir, cs_files[-1]), staged / cs_files[-1])
    eng2 = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake_resume"),
            changelog_paths=(str(staged),),
            num_partitions=8,
            salt_factor=2,
            epoch_events=300,
        )
    )
    eng2.replay()

    ref = _engine(tmp_path, "lake_oneshot", [pq_dir])
    ref.replay()
    got = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    want = ref.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert got.equals(want), "CSV resume diverged from one-shot parquet replay"


def test_csv_missing_seq_column_names_the_file(tmp_path):
    """A misproduced CSV without a seq header raises the parquet-path
    error contract: ValueError naming the bad file."""
    from nifi_processors_ray.sources import tailer

    p = str(tmp_path / "noseq.csv")
    with open(p, "w") as f:
        f.write("x,y\n1,2\n")
    with pytest.raises(ValueError, match="no 'seq' column.*noseq.csv"):
        tailer.scan_log([p])
