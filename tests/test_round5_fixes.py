"""Round-5 regression pins for the round-4 ADVICE findings.

- cmd_export pins the epoch BEFORE writing any partition, so a
  crash-resume against an advanced lake refuses instead of silently
  stitching a mixed-epoch export (__main__.py cmd_export).
- orders_yoy_growth mirrors DuckDB's DOUBLE division-by-zero → NULL
  when a year's revenue sums to exactly 0 cents (ops/relational.py).
"""

import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

import nifi_processors_ray.__main__ as M
from nifi_processors_ray.ops.relational import ORDERS_YOY_SQL, orders_yoy_growth
from nifi_processors_ray.synth import write_generated_changelog


def test_export_crash_resume_refuses_advanced_lake(tmp_path, monkeypatch):
    """A crashed export (epoch pinned, no partition finished) must refuse
    to resume once the lake advanced — the pin is written BEFORE the
    sink runs, exactly so this case can be detected."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 600, files=2, n_convs=10)
    lake = str(tmp_path / "lake")
    base = [
        "replay", "--lake", lake, "--log", log,
        "--partitions", "2", "--epoch-events", "200",
    ]
    assert M.main(base) == 0
    out_dir = str(tmp_path / "export")
    exp = [
        "export", "--lake", lake, "--log", log, "--partitions", "2",
        "--output", out_dir, "--export-partitions", "2",
    ]

    import nifi_processors_ray.sinks as sinks

    def boom(*a, **k):
        raise RuntimeError("injected crash before any partition completes")

    monkeypatch.setattr(sinks, "write_partitioned_parquet", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.main(exp)
    monkeypatch.undo()

    marker = os.path.join(out_dir, "_export_epoch.json")
    assert os.path.exists(marker), "epoch must be pinned before the sink runs"
    pinned = json.load(open(marker))["epoch"]

    # advance the lake (forget writes a tombstone epoch)
    assert M.main(
        ["forget", "--lake", lake, "--log", log, "--partitions", "2",
         "--conv", "conv-0"]
    ) == 0

    # resume against the advanced lake → refuse (mixed-epoch guard)
    assert M.main(exp) == 2

    # a fresh directory exports the new epoch cleanly
    out2 = str(tmp_path / "export2")
    exp2 = [a if a != out_dir else out2 for a in exp]
    assert M.main(exp2) == 0
    assert json.load(open(os.path.join(out2, "_export_epoch.json")))["epoch"] > pinned


def test_yoy_zero_revenue_year_matches_duckdb(tmp_path):
    """A year whose revenue sums to exactly 0 cents must yield a NULL
    ratio for the following year (DuckDB DOUBLE x/0 → NULL), not a
    ZeroDivisionError."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    tbl = pa.table(
        {
            "o_orderdate": pa.array(
                ["1995-01-01", "1995-06-01", "1996-03-01", "1997-02-01"]
            ).cast(pa.date32()),
            # 1995 sums to exactly zero; 1996→ratio vs 0 divisor
            "o_totalprice": pa.array([100.0, -100.0, 50.0, 75.0], pa.float64()),
        }
    )
    pq.write_table(tbl, f"{sf}/orders.parquet")
    got = orders_yoy_growth(sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')")
    want = con.sql(ORDERS_YOY_SQL).df()
    cols = sorted(want.columns)
    assert got[cols].sort_values(cols).reset_index(drop=True).equals(
        want[cols].sort_values(cols).reset_index(drop=True)
    )
    # the 1996 row is the div-by-zero case: ratio NULL, delta present
    import math

    r96 = got[got.yr == 1996].iloc[0]
    assert r96.rev_cents == 5000 and r96.yoy_cents == 5000
    assert math.isnan(r96.yoy_ratio)


def test_cli_enrich_hook(tmp_path):
    """`--enrich module:fn` injects the user-extension seam from the
    deployment surface (the reference wires RecordsHandler the same
    way); the enriched column lands in the lake."""
    import subprocess

    mod_dir = tmp_path / "ext"
    mod_dir.mkdir()
    (mod_dir / "my_enrich.py").write_text(
        "import pyarrow.compute as pc\n"
        "def add_text_len(batch):\n"
        "    return batch.append_column('text_len', pc.utf8_length(batch.column('text')))\n"
    )
    log = str(tmp_path / "log")
    write_generated_changelog(log, 400, files=1, n_convs=10)
    lake = str(tmp_path / "lake")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{mod_dir}:{env.get('PYTHONPATH', '')}"
    r = subprocess.run(
        [sys.executable, "-m", "nifi_processors_ray", "replay",
         "--lake", lake, "--log", log, "--partitions", "2",
         "--enrich", "my_enrich:add_text_len"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import glob

    files = glob.glob(lake + "/data/**/*.parquet", recursive=True)
    assert files
    t = pq.read_table(files[0])
    assert "text_len" in t.schema.names
    import pyarrow.compute as pc

    valid = t.filter(pc.is_valid(t.column("text")))
    assert pc.all(
        pc.equal(valid.column("text_len"), pc.utf8_length(valid.column("text")))
    ).as_py()

    # bad specs fail fast with a usable message
    for bad in ("my_enrich", "nosuchmod:fn", "my_enrich:nosuchfn"):
        rb = subprocess.run(
            [sys.executable, "-m", "nifi_processors_ray", "replay",
             "--lake", str(tmp_path / "lake2"), "--log", log,
             "--enrich", bad],
            capture_output=True, text=True, cwd="/root/repo", env=env,
        )
        assert rb.returncode != 0


def test_export_corrupt_marker_refuses_cleanly(tmp_path):
    """A crash DURING the pin write can no longer leave a truncated
    marker (temp+rename), but a corrupt one from any other cause must
    refuse with the immutable-export message, not a JSONDecodeError
    traceback that makes the operator hand-delete the guard."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 300, files=1, n_convs=5)
    lake = str(tmp_path / "lake")
    assert M.main(
        ["replay", "--lake", lake, "--log", log, "--partitions", "2",
         "--epoch-events", "300"]
    ) == 0
    out_dir = str(tmp_path / "export")
    os.makedirs(out_dir)
    with open(os.path.join(out_dir, "_export_epoch.json"), "w") as f:
        f.write('{"epo')  # truncated mid-write
    rc = M.main(
        ["export", "--lake", lake, "--log", log, "--partitions", "2",
         "--output", out_dir, "--export-partitions", "2"]
    )
    assert rc == 2
    # no partition data was written into the poisoned directory
    assert not [p for p in os.listdir(out_dir) if p.endswith(".parquet")]


def test_export_marker_valid_json_non_object_refuses(tmp_path):
    """Valid JSON that is not an object ('null', a list) must hit the
    same clean refusal as truncated JSON, not a TypeError traceback."""
    log = str(tmp_path / "log")
    write_generated_changelog(log, 300, files=1, n_convs=5)
    lake = str(tmp_path / "lake")
    assert M.main(
        ["replay", "--lake", lake, "--log", log, "--partitions", "2",
         "--epoch-events", "300"]
    ) == 0
    for i, payload in enumerate(["null", "[1]", '"3"']):
        out_dir = str(tmp_path / f"export{i}")
        os.makedirs(out_dir)
        with open(os.path.join(out_dir, "_export_epoch.json"), "w") as f:
            f.write(payload)
        rc = M.main(
            ["export", "--lake", lake, "--log", log, "--partitions", "2",
             "--output", out_dir, "--export-partitions", "2"]
        )
        assert rc == 2, payload
