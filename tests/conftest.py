"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the fake-backend
pattern SURVEY.md §4 calls for). Must run before jax initializes."""

import os

# The axon sitecustomize exports JAX_PLATFORMS=axon and registers its PJRT
# plugin before conftest runs, so overriding the env var alone is NOT enough
# (see .claude/skills/verify/SKILL.md). Force the platform through the config
# API before any backend initializes, and set the virtual device count.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture()
def img_u8(rng):
    """A deterministic 64x96 uint8 RGB test image with smooth + sharp content."""
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.5 * np.sin(xx / 9.0),
            0.5 + 0.5 * np.cos(yy / 7.0),
            np.clip((xx + yy) / (h + w), 0, 1),
        ],
        axis=-1,
    )
    noise = rng.uniform(0, 0.25, size=(h, w, 3)).astype(np.float32)
    img = np.clip(base * 0.8 + noise, 0, 1)
    img[20:28, 30:50] = [1.0, 0.1, 0.05]  # sharp patch for blur testing
    return (img * 255).astype(np.uint8)


@pytest.fixture()
def img_f32(img_u8):
    return img_u8.astype(np.float32) / 255.0


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


@pytest.fixture(scope="session")
def psnr_fn():
    return psnr
