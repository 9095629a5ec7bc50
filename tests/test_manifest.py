"""Manifest store: atomic commit, round-trip, CURRENT pointer."""

import json
import os

from nifi_processors_ray.state.manifest import Manifest, ManifestStore


def _man(epoch, wm):
    return Manifest(
        epoch=epoch,
        num_partitions=4,
        salt_factor=2,
        hash_fingerprint="fp",
        watermarks={p: wm for p in range(4)},
        files={0: [f"data/epoch={epoch}/part-00000.parquet"]},
        rows={0: 10},
    )


def test_roundtrip(tmp_path):
    store = ManifestStore(str(tmp_path))
    assert store.latest() is None
    store.commit(_man(1, 100))
    m = store.latest()
    assert m.epoch == 1 and m.watermark(2) == 100 and m.min_watermark == 100
    assert m.files[0] == ["data/epoch=1/part-00000.parquet"]


def test_current_points_to_latest(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.commit(_man(1, 100))
    store.commit(_man(2, 200))
    assert store.latest().epoch == 2
    # older snapshot still readable (time travel)
    with open(tmp_path / "manifest-0000000001.json") as f:
        assert json.loads(f.read())["epoch"] == 1


def test_no_partial_manifest_files(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.commit(_man(1, 100))
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_min_watermark_requires_all_partitions(tmp_path):
    m = Manifest(epoch=1, num_partitions=4, salt_factor=1, hash_fingerprint="fp",
                 watermarks={0: 5, 1: 5})
    assert m.min_watermark == -1  # unknown partitions → conservative
