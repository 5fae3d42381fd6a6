"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the reference-scale test
strategy in SURVEY.md §4. Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent XLA-CPU compile cache: reruns of the big suite skip most
# compilations (also narrows the window for the rare XLA-CPU compiler
# segfault seen in single-process full-suite runs on small boxes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vspl_jax_cache_cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax and pins jax_platforms before conftest
# runs; override it back to CPU for the test suite.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_jit_executables_per_module():
    """Free accumulated in-process XLA executables between test modules.

    Single-process full-suite runs on small boxes can segfault inside an
    XLA-CPU compile after a few hundred accumulated executables (observed
    rc 139 in different modules depending on ordering). Dropping the jit
    caches per module bounds the live-executable count; the persistent
    disk compilation cache (JAX_COMPILATION_CACHE_DIR above) keeps the
    recompiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)


def random_hmm(rng, S, T, sparse_obs=False):
    """Random row-stochastic transition, init probs, and observation probs.

    With sparse_obs=True, most observation entries are exactly 0 (as produced
    by the peak-picking observation model) to exercise log(tiny) floors.
    """
    A = rng.random((S, S)).astype(np.float32) ** 4
    A /= A.sum(axis=1, keepdims=True)
    A = A.astype(np.float32)
    A /= A.sum(axis=1, keepdims=True)
    pi = rng.random(S).astype(np.float64)
    pi /= pi.sum()
    obs = rng.random((S, T)).astype(np.float32)
    if sparse_obs:
        mask = rng.random((S, T)) < 0.9
        obs = np.where(mask, 0.0, obs).astype(np.float32)
        # ensure at least one nonzero per frame
        dead = obs.sum(axis=0) == 0
        obs[0, dead] = 1.0
    obs /= np.maximum(obs.sum(axis=0, keepdims=True), 1e-30)
    return A, pi.astype(np.float64), obs.astype(np.float32)
