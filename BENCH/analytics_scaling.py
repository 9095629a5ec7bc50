"""N→4N scaling evidence for the ANALYTICS surface (replay has its own
artifact in SCALING.json; this pins that the lakehouse-side pipelines
scale the same way).

Workload: one trial = three representative pipelines run back to back —
`lineitem_pricing_summary` (wide aggregation), `events_window_agg`
(windowed aggregate with partial combine), and `corpus_clean` (dedup +
quality gate, one shuffle) — over a COPIES×-amplified sf0.1 (at the
256× default: 512M events / 154M lineitems / 1.28M documents, ids
offset and texts suffixed per copy so keys stay distinct and dedup
behavior stays realistic).  sf0.1 itself is too small to scale: a
~1.2 s trial is fixed overhead at any core count (measured 4-core
1.23 s vs 16-core 1.28 s), which says nothing about the pipelines —
and the round-5 fragment reader made the 64× fixture too small the
same way (8 s trials).  Protocol matches bench.py --scaling:
each level runs in a FRESH process pinned to exactly N cores
(sched_setaffinity inherited by all Ray workers), trials-min after a
warmup trial, inter-leg loadavg cooldown.

Run: python BENCH/analytics_scaling.py   (~4 min)
Writes BENCH/ANALYTICS_SCALING.json and prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 256× since round 5: the multi-file fragment reader cut trial times
# ~10× (82.8 s → 8.1 s at 4 cpus on the 64× fixture), pushing trials
# under the ≥20 s-small-leg floor where they measure fixed overhead
# instead of scaling (the harness's own round-4 lesson)
COPIES = int(os.environ.get("NPR_ANA_COPIES", "256"))
SF_DIR = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"npr_ana_sf_{COPIES}x_{os.path.basename(SRC_SF)}"
)
# same amplified data as ONE file per table (64 row groups): measures
# that row-group fragment reads give single-file layouts the same scan
# parallelism as the many-file layout (round-5 reader change)
SF1_DIR = os.path.join(
    os.environ.get("TMPDIR", "/tmp"),
    f"npr_ana_sf_{COPIES}x1f_{os.path.basename(SRC_SF)}",
)
QUERIES = ["lineitem_pricing_summary", "events_window_agg", "corpus_clean"]


def prepare() -> None:
    """Amplify the three needed tables COPIES× (idempotent): one FILE
    per copy inside a directory named ``{table}.parquet`` — Ray decodes
    a single parquet file in ONE read task no matter the block
    override, so a single-file fixture would serialize the scan and
    measure nothing; real lakes (and the engine's own sinks) are
    many-file, and a directory read parallelizes per file."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(SF_DIR, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(SF_DIR, exist_ok=True)
    for name, idcol, offset in [
        ("events", "event_id", 100_000_000),
        ("lineitem", "l_orderkey", 100_000_000),
        ("documents", "doc_id", 10_000_000),
    ]:
        t = pq.read_table(os.path.join(SRC_SF, f"{name}.parquet"))
        out = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.isfile(out):
            os.remove(out)
        os.makedirs(out, exist_ok=True)
        for c in range(COPIES):
            p = t
            if c > 0:
                i = p.schema.get_field_index(idcol)
                p = p.set_column(
                    i, idcol, pc.add(p.column(idcol), c * offset).cast(t.schema.field(idcol).type)
                )
                if name == "documents":
                    j = p.schema.get_field_index("text")
                    p = p.set_column(
                        j, "text",
                        pc.binary_join_element_wise(
                            p.column("text").cast(pa.string()), f" v{c}", ""
                        ),
                    )
            pq.write_table(p, os.path.join(out, f"copy-{c:03d}.parquet"))
    # the remaining tables are read by some query plans' dims — link them
    for f in os.listdir(SRC_SF):
        if f.endswith(".parquet") and not os.path.exists(os.path.join(SF_DIR, f)):
            os.symlink(os.path.join(SRC_SF, f), os.path.join(SF_DIR, f))
    with open(done, "w") as fh:
        fh.write("ok")


def prepare_single_file() -> None:
    """Same amplified tables as :func:`prepare`, but ONE parquet file per
    table with one row group per copy — the layout a producer that
    doesn't shard would hand the engine."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(SF1_DIR, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    for name, idcol, offset in [
        ("events", "event_id", 100_000_000),
        ("lineitem", "l_orderkey", 100_000_000),
        ("documents", "doc_id", 10_000_000),
    ]:
        t = pq.read_table(os.path.join(SRC_SF, f"{name}.parquet"))
        out = os.path.join(SF1_DIR, f"{name}.parquet")
        writer = pq.ParquetWriter(out, t.schema)
        for c in range(COPIES):
            p = t
            if c > 0:
                i = p.schema.get_field_index(idcol)
                p = p.set_column(
                    i, idcol, pc.add(p.column(idcol), c * offset).cast(t.schema.field(idcol).type)
                )
                if name == "documents":
                    j = p.schema.get_field_index("text")
                    p = p.set_column(
                        j, "text",
                        pc.binary_join_element_wise(
                            p.column("text").cast(pa.string()), f" v{c}", ""
                        ),
                    )
            writer.write_table(p, row_group_size=p.num_rows)  # 1 rg per copy
        writer.close()
    for f in os.listdir(SRC_SF):
        if f.endswith(".parquet") and not os.path.exists(os.path.join(SF1_DIR, f)):
            os.symlink(os.path.join(SRC_SF, f), os.path.join(SF1_DIR, f))
    with open(done, "w") as fh:
        fh.write("ok")


def child(cpus: int, trials: int, sf_dir: str = None) -> None:
    sf_dir = sf_dir or SF_DIR
    os.sched_setaffinity(0, set(range(cpus)))
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    q = E.queries()

    def one_trial() -> dict:
        per = {}
        for name in QUERIES:
            t0 = time.perf_counter()
            res = q[name](sf_dir)
            # consume fully (count() is a full execution for these plans)
            res.count()
            per[name] = time.perf_counter() - t0
        return per

    trials_per = [one_trial() for _ in range(trials + 1)][1:]  # drop warmup
    per_query = {
        name: round(min(t[name] for t in trials_per), 3) for name in QUERIES
    }
    print(
        json.dumps(
            {
                "cpus": cpus,
                "trial_min_sec": round(sum(per_query.values()), 3),
                "per_query_min_sec": per_query,
            }
        )
    )
    ray.shutdown()


def _run_levels(levels, sf_dir):
    results = {}
    for cpus in levels:
        waited = 0
        while os.getloadavg()[0] > 1.5 and waited < 180:
            time.sleep(10)
            waited += 10
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", "--cpus",
             str(cpus), "--sf", sf_dir],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            raise SystemExit(f"child cpus={cpus} failed")
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = levels
    efficiency = round(
        (results[lo]["trial_min_sec"] / results[hi]["trial_min_sec"]) / (hi / lo), 3
    )
    per_query_eff = {
        name: round(
            (results[lo]["per_query_min_sec"][name] / results[hi]["per_query_min_sec"][name])
            / (hi / lo),
            3,
        )
        for name in QUERIES
    }
    return {
        "value": efficiency,
        "per_query_efficiency": per_query_eff,
        "sf_dir": sf_dir,
        "trial_min_sec": {str(c): results[c]["trial_min_sec"] for c in levels},
        "per_query_min_sec": {str(c): results[c]["per_query_min_sec"] for c in levels},
    }


def main() -> None:
    if "--child" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        sf = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else None
        child(cpus, trials=4, sf_dir=sf)
        return
    prepare()
    prepare_single_file()
    levels = (4, 16)
    multi = _run_levels(levels, SF_DIR)
    single = _run_levels(levels, SF1_DIR)
    out = {
        "metric": "analytics_scaling_efficiency",
        "value": multi["value"],
        "queries_per_trial": QUERIES,
        "cpu_ratio": levels[1] / levels[0],
        "multi_file": multi,
        # same data as ONE file/table (one row group per copy): fragment
        # reads must give it the same scan parallelism as the many-file
        # layout
        "single_file": single,
    }
    with open(os.path.join(REPO, "BENCH", "ANALYTICS_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
