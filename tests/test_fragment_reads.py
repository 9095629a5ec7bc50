"""Row-group fragment reads (round 5): a single parquet file with
multiple row groups must scan in PARALLEL tasks (Ray's own reader
decodes one file serially regardless of override_num_blocks), with
identical content, projected columns, and metadata-free schemas.
Single-row-group files (all testdata fixtures) keep Ray's reader."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nifi_processors_ray.sources.reader import read_parquet, read_parquet_exchange


def _write(path, n=200_000, rgs=8):
    t = pa.table(
        {
            "a": np.arange(n, dtype=np.int64),
            "b": np.random.default_rng(7).random(n),
        }
    )
    pq.write_table(t, path, row_group_size=n // rgs)
    return t


def test_fragment_read_parallel_and_exact(tmp_path):
    p = str(tmp_path / "big.parquet")
    t = _write(p)
    ds = read_parquet_exchange(p, columns=["a"])
    mat = ds.materialize()
    assert mat.num_blocks() > 1, "multi-row-group single file must fan out"
    got = mat.to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == t.column("a").to_pylist()
    assert list(got.columns) == ["a"]
    for b in ds.iter_batches(batch_format="pyarrow"):
        assert not b.schema.metadata
        break


def test_fragment_read_ragged_row_groups(tmp_path):
    """Ragged row groups (last one short) split by rows, no loss."""
    p = str(tmp_path / "ragged.parquet")
    n = 130_001
    t = pa.table({"a": np.arange(n, dtype=np.int64)})
    pq.write_table(t, p, row_group_size=20_000)  # 7 groups, last 10k+1
    got = read_parquet_exchange(p).to_pandas().sort_values("a")
    assert got["a"].tolist() == list(range(n))


def test_filter_kwarg_bypasses_fragment_path(tmp_path):
    """A pushed row filter keeps Ray's reader (the fragment path doesn't
    re-implement predicate pushdown) and still returns correct rows."""
    p = str(tmp_path / "filt.parquet")
    _write(p)
    ds = read_parquet(p, columns=["a"], filter=pc.field("a") < 100)
    got = ds.to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == list(range(100))


def test_single_row_group_file_unchanged(tmp_path):
    p = str(tmp_path / "small.parquet")
    t = pa.table({"a": np.arange(1000, dtype=np.int64)})
    pq.write_table(t, p)  # one row group
    got = read_parquet_exchange(p).to_pandas().sort_values("a")
    assert got["a"].tolist() == list(range(1000))


def test_directory_fragment_read(tmp_path):
    """A directory of same-schema files decodes per-file (one block per
    file by default), exact content, projected column order pinned."""
    d = tmp_path / "dir.parquet"
    d.mkdir()
    n = 40_000
    t = pa.table(
        {
            "a": np.arange(n, dtype=np.int64),
            "b": np.random.default_rng(3).random(n),
        }
    )
    for i in range(8):
        pq.write_table(t.slice(i * 5_000, 5_000), str(d / f"part-{i:03d}.parquet"))
    (d / "_DONE").write_text("")  # markers must be skipped
    mat = read_parquet(str(d), columns=["b", "a"]).materialize()
    assert mat.num_blocks() == 8
    got = mat.to_pandas()
    assert list(got.columns) == ["b", "a"]
    assert sorted(got["a"].tolist()) == list(range(n))
    for b in mat.iter_batches(batch_format="pyarrow"):
        assert not b.schema.metadata
        break


def test_file_list_fragment_read(tmp_path):
    n = 10_000
    t = pa.table({"a": np.arange(n, dtype=np.int64)})
    p1, p2 = str(tmp_path / "x.parquet"), str(tmp_path / "y.parquet")
    pq.write_table(t.slice(0, 5_000), p1)
    pq.write_table(t.slice(5_000), p2)
    got = read_parquet([p1, p2]).to_pandas()
    assert sorted(got["a"].tolist()) == list(range(n))


def test_mixed_schema_directory_falls_back(tmp_path):
    """Files with differing schemas must NOT take the fragment path —
    Ray's reader defines the unification semantics."""
    d = tmp_path / "mixed.parquet"
    d.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), str(d / "x.parquet"))
    pq.write_table(
        pa.table({"a": pa.array([3, 4], pa.int64()), "c": ["u", "v"]}),
        str(d / "y.parquet"),
    )
    got = read_parquet(str(d)).to_pandas()
    assert sorted(got["a"].tolist()) == [1, 2, 3, 4]


def test_filter_read_keeps_auto_blocks(tmp_path):
    """Round-5 review regression: a pushed filter bypasses the fragment
    plan but must NOT lose the footer-sized override_num_blocks —
    auto_blocks exists to avoid Ray's ~200-near-empty-block exchange
    overhead on exactly these filtered scans."""
    p = str(tmp_path / "f.parquet")
    _write(p)  # 200k rows
    ds = read_parquet_exchange(p, columns=["a"], filter=pc.field("a") >= 0)
    mat = ds.materialize()
    assert mat.count() == 200_000
    # footer sizing: ceil(200k/64k)=4 capped at session cpus — far
    # below Ray's default ~200-block floor
    assert mat.num_blocks() <= 16


def test_env_zero_disables_fragment_path(tmp_path, monkeypatch):
    """NPR_READ_ROWS_PER_BLOCK=0 is the documented escape hatch back to
    Ray's own reader — the fragment planner must honor it too."""
    monkeypatch.setenv("NPR_READ_ROWS_PER_BLOCK", "0")
    p = str(tmp_path / "e.parquet")
    _write(p)  # multi-row-group: would otherwise take the fragment path
    ds = read_parquet(p, columns=["a"])
    mat = ds.materialize()
    assert mat.count() == 200_000
    assert "ReadParquet" in mat.stats()  # Ray's reader, not FromItems


def test_marker_subdirectories_are_pruned(tmp_path):
    """Ray ignores '_'/'.'-prefixed path segments — a _staging/ subtree
    containing parquet must never be read as committed data (round-5
    review probe: the fragment walk descended into it)."""
    d = tmp_path / "lake.parquet"
    (d / "_staging").mkdir(parents=True)
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), str(d / "good.parquet"))
    pq.write_table(pa.table({"a": pa.array([99], pa.int64())}), str(d / "_staging" / "tmp.parquet"))
    got = read_parquet(str(d)).to_pandas()
    assert sorted(got["a"].tolist()) == [1, 2]


def test_hive_directory_keeps_auto_blocks(tmp_path):
    """The hive fallback must not silently drop footer-sized blocks on
    exchange-bound reads (round-5 review)."""
    d = tmp_path / "hive2.parquet"
    (d / "year=2024").mkdir(parents=True)
    t = pa.table({"a": np.arange(50_000, dtype=np.int64)})
    pq.write_table(t, str(d / "year=2024" / "p.parquet"))
    mat = read_parquet_exchange(str(d)).materialize()
    assert mat.count() == 50_000
    assert set(mat.schema().names) == {"a", "year"}
    # 50k rows -> 1 rows-based block; far below Ray's ~200-block floor
    assert mat.num_blocks() <= 16


def test_hive_partitioned_directory_falls_back(tmp_path):
    """key=value path segments are COLUMNS under Ray's reader — the
    fragment path must not silently drop them (round-5 probe)."""
    d = tmp_path / "hive.parquet"
    (d / "year=2024").mkdir(parents=True)
    (d / "year=2025").mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), str(d / "year=2024" / "p.parquet"))
    pq.write_table(pa.table({"a": pa.array([3, 4], pa.int64())}), str(d / "year=2025" / "p.parquet"))
    ds = read_parquet(str(d))
    assert set(ds.schema().names) == {"a", "year"}
    got = ds.to_pandas().sort_values("a")
    assert got["year"].tolist() == ["2024", "2024", "2025", "2025"]


def test_exchange_coalesces_directory_blocks(tmp_path):
    """auto_blocks on a many-small-file directory coalesces to the
    data-scaled block target instead of one block per file."""
    d = tmp_path / "many.parquet"
    d.mkdir()
    t = pa.table({"a": np.arange(64_000, dtype=np.int64)})
    for i in range(32):
        pq.write_table(t.slice(i * 2_000, 2_000), str(d / f"p{i:03d}.parquet"))
    mat = read_parquet_exchange(str(d)).materialize()
    # 64k rows -> 1 rows-based block, tiny bytes -> far fewer than 32
    assert mat.num_blocks() < 32
    assert sorted(mat.to_pandas()["a"].tolist()) == list(range(64_000))


def test_few_row_groups_still_fan_out_to_requested_blocks(tmp_path):
    """A file with FEWER row groups than the wanted block count must not
    cap downstream fan-out at the row-group count (Ray's reader would
    have delivered the request via SplitBlocks after its serial decode;
    the fragment path yields zero-copy slices per unit instead)."""
    p = str(tmp_path / "threegroups.parquet")
    n = 30_000
    t = pa.table({"a": np.arange(n, dtype=np.int64)})
    pq.write_table(t, p, row_group_size=n // 3)  # exactly 3 row groups
    ds = read_parquet(p, override_num_blocks=16)
    mat = ds.materialize()
    assert mat.num_blocks() >= 16, f"got {mat.num_blocks()} blocks"
    assert sorted(mat.to_pandas()["a"].tolist()) == list(range(n))


def test_large_directory_plan_bounds_open_fds(tmp_path):
    """Footer planning over many files must hold at most a pool's worth
    of parquet handles open at once (a ~1500-file directory on a
    ulimit -n 1024 box must not EMFILE)."""
    import resource

    d = tmp_path / "many"
    d.mkdir()
    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    n_files = 300
    for i in range(n_files):
        pq.write_table(t, str(d / f"p{i:04d}.parquet"))
    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    try:
        resource.setrlimit(resource.RLIMIT_NOFILE, (min(256, soft), hard))
        ds = read_parquet(str(d))
        got = ds.to_pandas()
    finally:
        resource.setrlimit(resource.RLIMIT_NOFILE, (soft, hard))
    assert len(got) == 2 * n_files


def test_symlinked_subdirectory_falls_back_to_ray(tmp_path):
    """pyarrow dataset discovery (Ray's reader) FOLLOWS directory
    symlinks; the fragment lister must refuse such layouts rather than
    silently dropping every row under the link (probed divergence:
    Ray read 4 rows, the walk-without-links lister listed 2)."""
    import os

    d = tmp_path / "tbl"
    real = tmp_path / "elsewhere"
    d.mkdir()
    real.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), str(d / "p.parquet"))
    pq.write_table(pa.table({"a": pa.array([3, 4], pa.int64())}), str(real / "q.parquet"))
    os.symlink(str(real), str(d / "linked"))
    got = read_parquet(str(d)).to_pandas()
    assert sorted(got["a"].tolist()) == [1, 2, 3, 4]
