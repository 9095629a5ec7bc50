"""Continuous tail (follow) mode: new log files picked up across polls."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nifi_processors_ray.config import EngineConfig
from nifi_processors_ray.pipelines.replay import CdcEngine
from nifi_processors_ray.synth import generate_changelog, write_generated_changelog


def test_follow_consumes_files_appended_between_polls(tmp_path):
    log = str(tmp_path / "log")
    write_generated_changelog(log, 1000, files=1, n_convs=20)
    eng = CdcEngine(
        EngineConfig(
            lake_dir=str(tmp_path / "lake"),
            changelog_paths=(log,),
            num_partitions=4,
            salt_factor=2,
            epoch_events=500,
        )
    )

    appended = {"done": False}

    def stop():
        # after the first drain, append a new log segment once; stop when
        # the follow loop has consumed it too
        if not appended["done"]:
            extra = generate_changelog(400, n_convs=20, seed=77)
            extra = extra.set_column(
                0, "seq", pa.array(np.asarray(extra.column("seq")) + 1000)
            )
            pq.write_table(extra, f"{log}/changelog-00099.parquet")
            appended["done"] = True
            return False
        return eng.store.latest().min_watermark >= 1399

    results = eng.follow(poll_ms=50, max_polls=20, stop=stop)
    assert eng.store.latest().min_watermark == 1399
    assert sum(r.n_applied + r.n_rejected for r in results) == 1400
