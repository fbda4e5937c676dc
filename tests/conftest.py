"""Test configuration.

Tests run on a virtual 8-device CPU mesh (per the build plan / driver
contract) with f64 enabled so golden-value parity against the reference's
NumPy harness (reference check.py / py_debug.txt) is exact to round-off.
Must run before the first jax import in any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # never run tests over the TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize pre-sets jax_platforms at interpreter startup, so the
# env var alone is not enough — force the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def golden_16x16():
    """The reference's hard-coded 16x16 golden system: the 6x6 Г-grid on
    [1,2]² (reference check_debug.py:13-36; diag −144 = −2·(36+36), off-diag
    36). The RHS is the check_debug.py variant — the one that produced the
    py_debug.txt golden trace (check.py carries a different, stale b)."""
    n = 16
    A = np.zeros((n, n))
    np.fill_diagonal(A, -144.0)
    links = [
        (0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 5), (4, 5), (4, 9),
        (5, 10), (6, 7), (6, 11), (7, 8), (7, 12), (8, 9), (8, 13), (9, 10),
        (9, 14), (10, 15), (11, 12), (12, 13), (13, 14), (14, 15),
    ]
    for i, j in links:
        A[i, j] = A[j, i] = 36.0
    b = np.array([
        -232.30388600, -746.04217916, -8.19479728, -232.07179336, -1.90842686,
        -138.98549422, -16.86945069, -15.74655606, -24.13616525, 22.22222222,
        -78.20643435, -3.41088194, 0.31859413, 1.13269176, 3.09816920,
        -60.31223634,
    ])
    return A, b
