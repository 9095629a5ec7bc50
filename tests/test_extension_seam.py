"""User-extension seam (RecordsHandler analog) + per-attempt lineage +
COW file splitting.

Reference contracts mirrored:
- injectable per-record handler: ``consumer/RecordsHandler.java:29-52``,
  injected via ``makeWorker`` (``consumer/GetKinesisStream.java:205-211``)
  — here ``EngineConfig.enrich`` (validate → enrich → partition) and
  ``EngineConfig.merge_policy`` (conflict resolution, default LWW).
- per-attempt result lineage: ``producer/PutKinesisStream.java:287-301,
  343-364`` — ``max_attempts`` retries with recorded attempt numbers,
  then dead-letter.
- max-message-size style output bounding:
  ``producer/AbstractKinesisProducerProcessor.java:40-68`` —
  ``target_rows_per_file`` splits COW rewrites.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nifi_processors_ray.config import ConfigError, EngineConfig
from nifi_processors_ray.oracle import apply_changelog
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.schema import CHANGELOG_SCHEMA, align_to_schema
from nifi_processors_ray.stages.merge import TRANSCRIPT_COLS, lww_policy
from nifi_processors_ray.synth import write_changelog_from_events

SF_DIR = "/root/testdata/sf0.001"


def read_log(paths):
    return pa.concat_tables(
        align_to_schema(pq.read_table(p), CHANGELOG_SCHEMA) for p in paths
    )


def make_engine(tmp_lake, log_dir, **over):
    kwargs = dict(
        lake_dir=tmp_lake,
        changelog_paths=(log_dir,),
        num_partitions=8,
        salt_factor=2,
        epoch_events=100_000,
    )
    kwargs.update(over)
    return CdcEngine(EngineConfig(**kwargs))


# ---------------------------------------------------------------------------
# enrich hook
# ---------------------------------------------------------------------------

def make_add_text_len():
    """A recording enrich handler (mirrors the injection pattern of
    ``consumer/GetKinesisStreamTest.java:95-117``).  Defined as a closure
    so cloudpickle ships it by value to the workers (a module-level test
    function would be pickled by reference and fail to import there)."""

    def add_text_len(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.append_column("text_len", _pc.utf8_length(batch.column("text")))

    return add_text_len


def _expected_text_len(final_pd):
    return final_pd["text"].map(lambda t: None if t is None else len(t))


def test_enrich_column_survives_replay(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log, enrich=make_add_text_len())
    eng.replay()

    final = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert "text_len" in final.columns
    assert final["text_len"].equals(_expected_text_len(final).astype(final["text_len"].dtype))

    # transcript payload still matches the naive oracle exactly
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert final[TRANSCRIPT_COLS].equals(oracle[TRANSCRIPT_COLS])


def test_enrich_column_survives_crash_resume_and_mor(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng1 = make_engine(
        tmp_lake, log, enrich=make_add_text_len(), epoch_events=400, merge_mode="mor",
        compact_threshold=2,
    )
    eng1.replay(max_epochs=1)  # "crash" mid-stream
    eng2 = make_engine(
        tmp_lake, log, enrich=make_add_text_len(), epoch_events=400, merge_mode="mor",
        compact_threshold=2,
    )
    eng2.replay()
    final = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert "text_len" in final.columns
    assert final["text_len"].equals(_expected_text_len(final).astype(final["text_len"].dtype))
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert final[TRANSCRIPT_COLS].equals(oracle[TRANSCRIPT_COLS])


def make_drop_seq():
    def drop_seq(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["seq"])

    return drop_seq


def test_enrich_must_preserve_envelope(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=2)
    eng = make_engine(tmp_lake, log, enrich=make_drop_seq())
    with pytest.raises(Exception, match="enrich hook dropped required"):
        eng.replay()


def test_enrich_must_be_callable():
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", enrich="not-a-callable")
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", merge_policy=42)


# ---------------------------------------------------------------------------
# merge-policy hook
# ---------------------------------------------------------------------------

def make_fww_policy():
    """First-writer-wins: keep each key's MIN-seq row (the inverse of the
    default LWW) — proves the conflict-resolution seam is really used."""

    def fww_policy(t: pa.Table) -> pa.Table:
        import pyarrow as pa
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("conv_id", "ascending"),
                ("turn_idx", "ascending"),
                ("seq", "descending"),
            ],
        )
        t = t.take(idx).combine_chunks()
        n = t.num_rows
        if n <= 1:
            return t
        conv, turn = t.column("conv_id"), t.column("turn_idx")
        same_next = pc.and_(
            pc.equal(conv.slice(0, n - 1), conv.slice(1)),
            pc.equal(turn.slice(0, n - 1), turn.slice(1)),
        ).combine_chunks()
        not_last = pa.chunked_array([same_next, pa.array([False])])
        return t.filter(pc.invert(pc.fill_null(not_last, False)))

    return fww_policy


def naive_fww(log: pa.Table):
    """Driver-side reference: first valid non-delete version per key wins."""
    import pandas as pd

    from nifi_processors_ray.oracle import split_valid

    valid, _ = split_valid(log)
    df = valid.to_pandas().sort_values("seq")
    first = df.groupby(["conv_id", "turn_idx"], as_index=False).first()
    first = first[first["op"] != "D"]
    return first.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_merge_policy_first_writer_wins(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log, merge_policy=make_fww_policy())
    eng.replay()
    final = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    expected = naive_fww(read_log(paths))
    assert len(final) == len(expected)
    assert final["text"].equals(expected["text"].reset_index(drop=True))
    # and it genuinely differs from the LWW outcome somewhere
    lww = apply_changelog(read_log(paths)).to_pandas()
    assert not final["text"].equals(lww["text"].reset_index(drop=True))


# ---------------------------------------------------------------------------
# per-attempt lineage + retry-then-dead-letter
# ---------------------------------------------------------------------------

def FlakyOncePolicy(marker_dir: str):
    """Raises a transient error exactly once (durable marker), then LWW."""
    marker = os.path.join(marker_dir, "failed-once")

    def policy(t: pa.Table) -> pa.Table:
        import os as _os

        from nifi_processors_ray.stages.merge import lww_policy as _lww

        if not _os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            raise OSError("injected transient fault")
        return _lww(t)

    return policy


def test_transient_fault_records_attempt_2(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=2)
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)
    eng = make_engine(
        tmp_lake, log, num_partitions=1, salt_factor=1,
        merge_policy=FlakyOncePolicy(marker_dir), max_attempts=3,
    )
    eng.replay()
    lin = eng.lineage().to_pandas()
    # the faulted partition recovered on attempt 2 and applied its rows
    assert lin["attempt"].max() == 2
    assert lin.loc[lin["attempt"] == 2, "n_applied"].iloc[0] > 0
    assert lin["error"].isna().all()
    # the recovered lake still matches the LWW oracle
    final = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert final.equals(oracle)


def AlwaysFailPolicy():
    def policy(t: pa.Table) -> pa.Table:
        raise RuntimeError("persistent failure")

    return policy


def test_poison_dead_letters_after_max_attempts(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=2)
    eng = make_engine(
        tmp_lake, log, num_partitions=1, salt_factor=1,
        merge_policy=AlwaysFailPolicy(), max_attempts=2,
    )
    res = eng.replay()
    assert len(res) == 1 and res[0].n_applied == 0
    lin = eng.lineage().to_pandas()
    assert (lin["attempt"] == 2).any()  # K attempts happened, all recorded
    assert lin["error"].notna().any() and "persistent failure" in lin["error"].dropna().iloc[0]
    # raw rows preserved for replay; watermark advanced (recorded loss)
    assert eng.deadletter().count() > 0
    assert eng.store.latest().min_watermark >= 0
    assert eng.replay() == []  # stream is not stuck


def test_attempt_markers_failure_only_and_vacuumed(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=2)
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)
    eng = make_engine(
        tmp_lake, log, num_partitions=1, salt_factor=1,
        merge_policy=FlakyOncePolicy(marker_dir), max_attempts=3,
    )
    eng.replay()
    attempts_root = os.path.join(eng.cfg.staging_dir, "attempts")
    # only the FAILED attempt left a marker (success path costs no I/O)
    n_markers = sum(len(fs) for _, _, fs in os.walk(attempts_root))
    assert n_markers == 1
    eng.vacuum()
    assert sum(len(fs) for _, _, fs in os.walk(attempts_root)) == 0


def test_success_path_writes_no_attempt_markers(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_from_events(SF_DIR, log, files=2)
    eng = make_engine(tmp_lake, log)
    eng.replay()
    attempts_root = os.path.join(eng.cfg.staging_dir, "attempts")
    assert sum(len(fs) for _, _, fs in os.walk(attempts_root)) == 0


# ---------------------------------------------------------------------------
# target_rows_per_file (COW split writes)
# ---------------------------------------------------------------------------

def test_cow_writes_split_at_target_rows(tmp_lake, tmp_path):
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng = make_engine(tmp_lake, log, num_partitions=2, target_rows_per_file=50)
    eng.replay()
    man = eng.store.latest()
    split_parts = [p for p, fs in man.files.items() if len(fs) > 1]
    assert split_parts, "no partition split its COW output"
    for fs in man.files.values():
        for f in fs:
            assert pq.ParquetFile(os.path.join(tmp_lake, f)).metadata.num_rows <= 50
    # resolution over the split file set is unchanged
    final = eng.final_state(sort=True).to_pandas().reset_index(drop=True)
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert final.equals(oracle)


def test_split_cow_crash_resume_identical(tmp_lake, tmp_path):
    """Crash between epochs with target_rows_per_file splitting active:
    a fresh engine resumes and the split file set + state are identical
    to an uninterrupted run (deterministic slicing at the same paths)."""
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)

    # uninterrupted reference run
    ref_lake = str(tmp_path / "ref_lake")
    ref = make_engine(ref_lake, log, num_partitions=2, target_rows_per_file=40,
                      epoch_events=400)
    ref.replay()
    ref_state = ref.final_state(sort=True).to_pandas().reset_index(drop=True)
    ref_files = {p: sorted(fs) for p, fs in ref.store.latest().files.items()}

    # crashed-and-resumed run
    eng1 = make_engine(tmp_lake, log, num_partitions=2, target_rows_per_file=40,
                       epoch_events=400)
    eng1.replay(max_epochs=1)  # "crash"
    eng2 = make_engine(tmp_lake, log, num_partitions=2, target_rows_per_file=40,
                       epoch_events=400)
    eng2.replay()
    state = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    files = {p: sorted(fs) for p, fs in eng2.store.latest().files.items()}

    assert state.equals(ref_state)
    # same split layout (same counts and row caps), paths differ only by epoch
    assert {p: len(fs) for p, fs in files.items()} == {p: len(fs) for p, fs in ref_files.items()}
    for fs in files.values():
        for f in fs:
            assert pq.ParquetFile(os.path.join(tmp_lake, f)).metadata.num_rows <= 40
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert state.equals(oracle)


def test_enrich_added_mid_stream_null_fills_prior_epochs(tmp_lake, tmp_path):
    """An enrich hook configured AFTER the lake already has epochs: prior
    COW files physically lack the enrichment column; merge must unify
    (null-fill old rows) exactly like the `tool` column's schema
    evolution.  Rows merged before the hook existed keep text_len=null
    unless a later event rewrote the key."""
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng1 = make_engine(tmp_lake, log, epoch_events=400)  # no enrich
    eng1.replay(max_epochs=1)
    eng2 = make_engine(tmp_lake, log, enrich=make_add_text_len(), epoch_events=400)
    eng2.replay()

    final = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert "text_len" in final.columns
    # transcript payload identical to the oracle regardless of when the
    # hook appeared
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert final[TRANSCRIPT_COLS].equals(oracle[TRANSCRIPT_COLS])
    # every non-null text_len is correct; keys last written before the
    # hook may be null but never wrong
    nn = final["text_len"].notna()
    expect = _expected_text_len(final)
    assert final.loc[nn, "text_len"].equals(
        expect[nn].astype(final["text_len"].dtype)
    )
    # the split is real: some rows predate the hook (null — the very
    # behavior in the test's name), some carry it
    assert nn.any() and (~nn).any()


def test_enrich_removed_mid_stream_keeps_column_null_filled(tmp_lake, tmp_path):
    """The reverse: epochs 1..k ran WITH the hook, the engine restarts
    without it.  Prior files carry text_len; new epoch rows lack it —
    unification keeps the column, null for newly-merged keys."""
    log = str(tmp_path / "log")
    paths = write_changelog_from_events(SF_DIR, log, files=3)
    eng1 = make_engine(tmp_lake, log, enrich=make_add_text_len(), epoch_events=400)
    eng1.replay(max_epochs=1)
    eng2 = make_engine(tmp_lake, log, epoch_events=400)  # hook gone
    eng2.replay()

    final = eng2.final_state(sort=True).to_pandas().reset_index(drop=True)
    assert "text_len" in final.columns
    oracle = apply_changelog(read_log(paths)).to_pandas().reset_index(drop=True)
    assert final[TRANSCRIPT_COLS].equals(oracle[TRANSCRIPT_COLS])
    nn = final["text_len"].notna()
    expect = _expected_text_len(final)
    # non-vacuous both ways: epoch-1 survivors still CARRY the value
    # (unification didn't drop or null the column), post-hook merges
    # are null
    assert nn.any() and (~nn).any()
    assert final.loc[nn, "text_len"].equals(
        expect[nn].astype(final["text_len"].dtype)
    )
