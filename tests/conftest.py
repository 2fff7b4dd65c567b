"""Test configuration: force CPU with 8 virtual devices (simulated mesh).

Must run before jax initializes — SURVEY.md §4 prescription: multi-device
tests use XLA_FLAGS=--xla_force_host_platform_device_count=8 to simulate a
TPU mesh without hardware.
"""

import os

# Hard-set (the ambient environment may preset JAX_PLATFORMS=axon/tpu; tests
# must run on local CPU with a simulated mesh).
os.environ["JAX_PLATFORMS"] = os.environ.get("TEM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep TF (used only for golden parity tests) off any accelerator.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# This environment compiles through a remote service (~5-10s/program even for
# CPU); a persistent cache makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest

# sitecustomize in this image imports jax and forces jax_platforms='axon,cpu'
# (remote TPU), ignoring the env var — override programmatically before any
# backend initialization.
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def has_tf():
    try:
        import tensorflow  # noqa: F401
        return True
    except Exception:
        return False


REFERENCE = "/root/reference"


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE, "transfer_em"))
