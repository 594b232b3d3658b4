"""Test harness config: run all tests on a fake 8-device CPU mesh.

Must set env vars before jax is imported anywhere (the standard JAX
substitute for fake multi-device backends; see SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms='axon,cpu' (remote TPU
# tunnel), overriding the env var — override it back so tests run on the
# local fake-8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: the suite compiles ~100 XLA programs; cache
# makes re-runs dramatically faster (override the dir to measure cold runs).
# The default dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT results
# embed the compile machine's features, and loading a cache written on a
# different host spams feature-mismatch errors and risks SIGILL (this is
# what broke the round-2 driver dryrun artifact).


def _machine_tag() -> str:
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            src = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        src = platform.processor() or platform.machine()
    # jaxlib version is part of the key: XLA:CPU AOT results also embed
    # compiler-version-dependent pseudo-features (e.g. +prefer-no-scatter)
    # that /proc/cpuinfo cannot see — a cache written by a different jaxlib
    # on an identical CPU still spams feature-mismatch load errors.  The
    # COMPILER ships in jaxlib, which can upgrade independently of the
    # pure-Python jax version, so key on the actual jaxlib.
    try:
        import jaxlib

        src += " jaxlib=" + getattr(jaxlib, "__version__", "?")
    except ImportError:  # pragma: no cover
        pass
    src += " jax=" + getattr(jax, "__version__", "?")
    return hashlib.sha1(src.encode()).hexdigest()[:10]


jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "UGPG_TEST_CACHE_DIR", f"/tmp/ugpg_jax_cache_cpu_{_machine_tag()}"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
