"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Tests validate multi-chip sharding logic without TPU hardware, per the
framework's parallel design (mesh over frames / RANSAC hypotheses).
"""

import os
import sys
from pathlib import Path

# The axon kernel env presets JAX_PLATFORMS=axon — override, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache in a PER-USER, PER-CPU-FINGERPRINT dir — cuts
# repeat suite runs from ~20 min of compiles to seconds. The fingerprint
# matters: /tmp CAN travel between machines here (container images carry
# it across builder/judge hosts with different CPU feature sets), and
# XLA:CPU loads feature-mismatched AOT executables anyway, logging a
# spurious ERROR per hit ("compile machine features ... vs host machine
# features ... could lead to execution errors such as SIGILL") — observed
# round 5 with judge-era entries. Keying the dir by the host's cpuinfo
# flags line makes every host populate (and hit) only its own entries.
_uid = os.getuid() if hasattr(os, "getuid") else "na"
try:
    import hashlib

    with open("/proc/cpuinfo") as _fh:
        _flags = next((l for l in _fh if l.startswith("flags")), "")
    _cpu_fp = hashlib.sha256(_flags.encode()).hexdigest()[:8]
except OSError:
    _cpu_fp = "nocpuinfo"
os.environ.setdefault(
    "MVSLAM_JAX_CACHE_DIR", f"/tmp/mvslam_jax_cache_cpu_{_uid}_{_cpu_fp}"
)
# Note: XLA:CPU logs a spurious ERROR per AOT cache hit ("prefer-no-gather
# is not supported on the host machine") — those pseudo-features are
# recorded in the AOT signature but never in host detection. Same-machine
# loads are safe; the noise cannot be silenced here because jaxlib is
# already loaded by sitecustomize before conftest runs.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

# jax is pre-imported by the axon sitecustomize before conftest runs, so the
# env var alone isn't authoritative; the config flag is read at backend init.
jax.config.update("jax_platforms", "cpu")


import gc  # noqa: E402

import pytest  # noqa: E402


def _rss_gb() -> float:
    try:
        with open("/proc/self/statm") as fh:
            pages = int(fh.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, ValueError, IndexError):
        return float("inf")  # can't measure — clear every module (safe side)


@pytest.fixture(autouse=True, scope="module")
def _release_jax_executables_between_modules():
    """Free live compiled executables at module boundaries when RSS grows.

    A long single-process suite accumulates hundreds of resident XLA:CPU
    executables (~10 GB RSS) and then intermittently dies (SIGSEGV/SIGABRT)
    inside the runtime while executing large programs — observed at 4
    unrelated call sites across runs on this jaxlib. Dropping the in-memory
    jit caches keeps the executable population small; the persistent
    compile cache (above) makes any re-trace cheap. Clearing is gated on
    measured RSS so light modules don't pay the re-trace tax — crashes
    were only ever observed many GB above this threshold.
    """
    yield
    if _rss_gb() > 3.5:
        jax.clear_caches()
        gc.collect()
