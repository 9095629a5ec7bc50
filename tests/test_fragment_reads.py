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
