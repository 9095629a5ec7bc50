"""Streaming ingest latency: per-epoch wall clock in steady-state tail.

The north-star deployment is a continuous tailer (`follow` mode /
`ray job submit`), where the operative metric is not bulk throughput
but PER-EPOCH LATENCY: how long after an epoch's events are present
does the lake's committed state include them.  Protocol: replay a
generated stream epoch by epoch (auto merge mode, the deployment
default) and record each epoch's wall; report mean / p50 / p95 and
the implied steady-state events/s.

Run: python BENCH/follow_latency.py   (owns its Ray session, ~2 min)
Writes BENCH/FOLLOW_LATENCY.json and prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOTAL = 4_000_000
EPOCH = 200_000  # 20 epochs of steady-state tail


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nifi_processors_ray.config import EngineConfig
    from nifi_processors_ray.pipelines.replay import CdcEngine
    from nifi_processors_ray.synth import write_generated_changelog

    log_dir = os.path.join(tempfile.gettempdir(), f"npr_follow_log_{TOTAL}")
    write_generated_changelog(log_dir, TOTAL, files=32, n_convs=max(TOTAL // 200, 1000))
    lake = tempfile.mkdtemp(prefix="npr_follow_lake_")
    try:
        eng = CdcEngine(
            EngineConfig(
                lake_dir=lake,
                changelog_paths=(log_dir,),
                num_partitions=64,
                salt_factor=4,
                epoch_events=EPOCH,
                merge_mode="auto",
            )
        )
        walls = []
        while True:
            t0 = time.perf_counter()
            res = eng.replay(max_epochs=1)
            if not res:
                break
            walls.append(time.perf_counter() - t0)
        lin = eng.lineage().to_pandas()
        modes = lin["file_mode"].dropna().value_counts().to_dict()
        # first epoch pays worker warmup + the bulk base; steady state
        # is everything after
        steady = sorted(walls[1:])
        n = len(steady)
        if n == 0:
            raise SystemExit("need >= 2 epochs for steady-state stats; raise TOTAL/EPOCH")
        out = {
            "metric": "per-epoch ingest latency (follow-mode steady state)",
            "events_total": TOTAL,
            "epoch_events": EPOCH,
            "epochs": len(walls),
            "first_epoch_sec": round(walls[0], 3),
            "steady_mean_sec": round(sum(steady) / n, 3),
            "steady_p50_sec": round(steady[n // 2], 3),
            "steady_p95_sec": round(steady[min(n - 1, int(n * 0.95))], 3),
            "steady_events_per_sec": round(EPOCH / (sum(steady) / n)),
            "file_modes": modes,
            "merge_mode": "auto",
            "loadavg": os.getloadavg()[0],
        }
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "FOLLOW_LATENCY.json"),
            "w",
        ) as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
