"""Test configuration: run JAX on CPU with 8 virtual devices.

SURVEY.md §4: multi-chip tests use a fake host-platform mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), and unit tests are
pure-function CPU tests — no TPU required.
"""

import os

# Skip the axon TPU PJRT registration (sitecustomize) entirely: tests are
# CPU-only, and a wedged TPU claim would otherwise block interpreter start.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This environment's sitecustomize imports jax at interpreter start, which
# snapshots JAX_PLATFORMS before the env overrides above — force the
# backend through the config API as well so the suite always runs on the
# 8-virtual-device CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def tmp_wav(tmp_path, rng):
    """A 1-second 24 kHz mono int16 WAV file."""
    from audiotoken_tpu.io.wavfile import write_wav

    t = np.arange(24_000) / 24_000
    wav = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(24_000)
    wav = wav.astype(np.float32)[None, :]
    path = str(tmp_path / "tone.wav")
    write_wav(path, wav, 24_000)
    return path
