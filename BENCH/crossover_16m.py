"""COW vs MOR vs AUTO crossover at a 16M-event lake (round-4 task).

Protocol: bulk-load a 16M-event changelog as epoch 1 into a fresh lake,
then apply ONE incremental epoch of D events (D = change volume) and
time it, per merge mode.  The crossover is the change ratio where COW's
full-partition rewrite stops losing to MOR's delta append.  AUTO should
track min(cow, mor) by picking per partition.

Run:  python BENCH/crossover_16m.py  (owns its Ray session; ~5 min)
Writes BENCH/CROSSOVER_16M.json and prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BULK = 16_000_000
DELTAS = [160_000, 800_000, 1_600_000, 3_200_000, 6_400_000]
MODES = ["cow", "mor", "auto"]


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

    total = BULK + max(DELTAS)
    log_dir = os.path.join(tempfile.gettempdir(), f"npr_xover_log_{total}_v2")
    # keyspace proportional to events (~6 events/key): the generator's
    # default 1,000 conversations (~32k keys) makes EVERY epoch touch
    # nearly every key at these delta sizes, so no change-fraction rule
    # could ever pick MOR — a measurement artifact of the synthetic
    # keyspace, not a property of the engine
    write_generated_changelog(log_dir, total, files=64, n_convs=max(BULK // 200, 1000))

    def _cooldown(threshold: float = 5.0, cap_s: int = 240) -> None:
        # each cell's own 16M bulk load inflates the 1-min loadavg for
        # the NEXT cell's stamp (observed 3.6 → 19.3 across an
        # uncooled run) — wait for decay so the stamp reads ambient +
        # residual, not the harness's own wake
        t0 = time.time()
        while os.getloadavg()[0] > threshold and time.time() - t0 < cap_s:
            time.sleep(10)

    results = []
    for delta in DELTAS:
        for mode in MODES:
            _cooldown()
            # ambient stamp at cell START: taken after the bulk it would
            # read the cell's own 32-cpu wake (observed 7-19 on an idle
            # box), which is a constant of the harness, not contention
            load0 = round(os.getloadavg()[0], 1)
            lake = tempfile.mkdtemp(prefix="npr_xover_lake_")
            try:
                base = dict(
                    lake_dir=lake,
                    changelog_paths=(log_dir,),
                    num_partitions=64,
                    salt_factor=4,
                )
                # epoch 1: bulk load (no prior base — every mode rewrites)
                CdcEngine(EngineConfig(**base, epoch_events=BULK, merge_mode=mode)).replay(
                    max_epochs=1
                )
                # epoch 2: the measured incremental apply of D events
                eng = CdcEngine(
                    EngineConfig(**base, epoch_events=delta, merge_mode=mode)
                )
                t0 = time.perf_counter()
                res = eng.replay(max_epochs=1)
                wall = time.perf_counter() - t0
                lineage = eng.lineage().to_pandas()
                ep2 = lineage[lineage["commit_epoch"] == 2]
                row = {
                    "delta_events": delta,
                    "change_ratio": round(delta / BULK, 3),
                    "mode": mode,
                    "epoch2_sec": round(wall, 2),
                    "epoch2_events_per_sec": round(delta / wall),
                    "applied": int(res[0].n_applied),
                    "append_parts": int((ep2["file_mode"] == "append").sum()),
                    "replace_parts": int((ep2["file_mode"] == "replace").sum()),
                    # single-trial cell: the ambient stamp is the
                    # provenance (only the ~3x low-ratio mode ordering
                    # is signal; <=20% deltas are run-to-run noise)
                    "loadavg_cell_start": load0,
                }
                results.append(row)
                print(json.dumps(row), flush=True)
            finally:
                shutil.rmtree(lake, ignore_errors=True)
    out = {"bulk_events": BULK, "num_partitions": 64, "results": results}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "CROSSOVER_16M.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "rows": len(results)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
