"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the driver's dryrun does the same);
the real TPU chip is used only by bench.py.
"""

import os

# No persistent compilation cache for the CPU test suite: XLA:CPU AOT
# executables record compile-pass pseudo-features (+prefer-no-gather, ...)
# that never match the host CPUID on reload, so every cache hit spams
# cpu_aot_loader feature-mismatch errors.  TPU runs (bench, probes) keep
# the cache — that's where compiles cost minutes.
os.environ.setdefault("NGRAVS_TPU_NO_CACHE", "1")

# must happen before jax backends initialize; the environment pre-registers a
# TPU platform via sitecustomize, so override through jax.config (env vars
# alone are latched too early to help)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
