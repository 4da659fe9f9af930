"""Test configuration: run everything on a virtual 8-device CPU platform.

Real-TPU benchmarking happens via bench.py; unit tests must be hermetic
and exercise multi-device sharding without hardware (SURVEY.md section 4
implication (d)).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness may preset e.g. "axon"
# The tunneled-TPU site hook (sitecustomize on PYTHONPATH) force-initializes
# its PJRT client in EVERY python process even under JAX_PLATFORMS=cpu; when
# the tunnel is down that init blocks forever, hanging the suite's
# subprocess tests.  Tests are hermetic CPU-only by design - drop the hook
# from the environment children inherit.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and "axon" not in p)
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
# executables make repeated runs cheap.  Tests get their OWN cache dir:
# sharing one with concurrent TPU/bench processes produced corrupt
# entries whose deserialization segfaults the suite (observed twice in
# jax compilation_cache.get_executable_and_time).
#
# The dir is keyed on the host's CPU feature set: sessions roam between
# heterogeneous machines, XLA:CPU AOT entries encode the COMPILE host's
# features (+prefer-no-scatter etc.), and cpu_aot_loader warns that
# loading mismatched entries "could lead to execution errors such as
# SIGILL" - the observed intermittent mid-suite segfaults.
def _cpu_cache_dir() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except (OSError, StopIteration):
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/root/.cache/jax-turborc-tests-{tag}"


jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_COMPILATION_CACHE_DIR",
                                 _cpu_cache_dir()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

# Crash-isolate persistent-cache WRITES: XLA:CPU's executable.serialize()
# intermittently segfaults late in long suite runs (observed twice, both
# times inside put_executable_and_time on large unrolled coder programs),
# killing the whole suite.  Fork a child to serialize+store; if the child
# crashes or hangs, the entry is simply not cached.  Writes go through
# temp-file + rename, so a killed child cannot corrupt the cache.
from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time


def _forked_put(cache_key, module_name, executable, backend, compile_time):
    pid = os.fork()
    if pid == 0:  # child: do the risky serialize + store, then hard-exit
        try:
            _orig_put(cache_key, module_name, executable, backend,
                      compile_time)
            os._exit(0)
        except BaseException:
            os._exit(1)
    import time
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        done, _status = os.waitpid(pid, os.WNOHANG)
        if done:
            return
        time.sleep(0.05)
    try:
        os.kill(pid, 9)
        os.waitpid(pid, 0)
    except OSError:
        pass


_cc.put_executable_and_time = _forked_put

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
