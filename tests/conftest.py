"""Test configuration: run everything on a virtual 8-device CPU platform.

Real-TPU benchmarking happens via bench.py; unit tests must be hermetic
and exercise multi-device sharding without hardware (SURVEY.md section 4
implication (d)).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness may preset e.g. "axon"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# some installed pytest plugin imports jax before this conftest runs, and
# jax binds JAX_PLATFORMS into its config at import time - override it
# directly (backends are not initialized yet at collection time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound on CPU; cached
# executables make repeated runs cheap.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax-turborc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0DEC)


def _skewed(rng, n, alphabet=256, alpha=1.3):
    """Zipf-ish byte distribution (entropy-codeable but nontrivial)."""
    p = 1.0 / np.arange(1, alphabet + 1) ** alpha
    p /= p.sum()
    return rng.choice(alphabet, size=n, p=p).astype(np.uint8)


def _runheavy(rng, n):
    """Run-length-heavy data approximating BWT output."""
    out = np.empty(n, np.uint8)
    i = 0
    while i < n:
        run = int(rng.geometric(0.05))
        sym = int(rng.integers(0, 256))
        out[i:i + run] = sym
        i += run
    return out


@pytest.fixture(scope="session")
def corpora(rng):
    return {
        "random": rng.integers(0, 256, size=1 << 14).astype(np.uint8),
        "skewed": _skewed(rng, 1 << 14),
        "runs": _runheavy(rng, 1 << 14),
        "zeros": np.zeros(1 << 12, np.uint8),
        "text": np.frombuffer(
            (b"the quick brown fox jumps over the lazy dog. " * 400),
            np.uint8).copy(),
    }
