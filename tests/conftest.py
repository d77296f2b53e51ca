"""Test config: force JAX onto a virtual 8-device CPU mesh before jax imports.

Parity tests compare against the torch reference on CPU in fp64/fp32, so CPU
execution is both hermetic and precise; multi-chip sharding tests use the 8
virtual devices (SURVEY.md §4 test plan)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-prepends the tunneled-TPU platform to
# jax_platforms; override it so tests run hermetically on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def assert_close(ours, theirs, tol=1e-4, name=""):
    ours = np.asarray(ours, dtype=np.float64)
    theirs = np.asarray(theirs, dtype=np.float64)
    assert ours.shape == theirs.shape, f"{name}: shape {ours.shape} vs {theirs.shape}"
    diff = np.max(np.abs(ours - theirs))
    denom = np.maximum(np.abs(theirs), 1e-6)
    rel = np.max(np.abs(ours - theirs) / denom)
    assert diff < tol or rel < tol, (
        f"{name}: max abs diff {diff:.3e}, max rel diff {rel:.3e} (tol {tol})"
    )
