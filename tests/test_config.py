"""Config validation — the customValidate cross-field rules reborn
(consumer/AbstractKinesisConsumerProcessor.java:289-316)."""

import pytest

from nifi_processors_ray.config import ConfigError, EngineConfig


def test_minimal_valid():
    cfg = EngineConfig(lake_dir="/tmp/x")
    assert cfg.num_partitions >= 1
    assert cfg.manifest_dir.endswith("_manifest")


def test_lake_dir_required():
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="")


@pytest.mark.parametrize(
    "kwargs",
    [
        {"batch_size": 0},
        {"epoch_events": 0},
        {"initial_position": "MIDDLE"},
        {"num_partitions": 0},
        {"salt_factor": 0},
        {"max_attempts": 0},
    ],
)
def test_bounds(kwargs):
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", **kwargs)


def test_access_secret_must_pair():
    # mirrors customValidate: access+secret set together
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", access_key="a")
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", secret_key="s")
    EngineConfig(lake_dir="/tmp/x", access_key="a", secret_key="s")


def test_credentials_file_xor_keys(tmp_path):
    f = tmp_path / "creds"
    f.write_text("x")
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", access_key="a", secret_key="s", credentials_file=str(f))
    EngineConfig(lake_dir="/tmp/x", credentials_file=str(f))
    with pytest.raises(ConfigError):
        EngineConfig(lake_dir="/tmp/x", credentials_file=str(tmp_path / "missing"))
