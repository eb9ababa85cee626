"""mvslam_tpu — TPU-native monocular visual SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
eliyacobov1/monocular-visual-slam (reference layer map in SURVEY.md):

- ``core``       — determinism registry, stable hashing, run artifacts,
                   telemetry, persistence (reference L0/L6).
- ``geometry``   — jitted SE(2)/SE(3)/Sim(3) Lie ops, projection,
                   triangulation, Umeyama alignment (replaces cv2.Rodrigues /
                   cv2.triangulatePoints paths).
- ``ops``        — TPU kernels: FAST corners, rBRIEF descriptors, packed
                   Hamming matching, vmapped RANSAC (replaces cv2 ORB /
                   BFMatcher / Python RANSAC loops, reference L2).
- ``frontend``   — feature pipeline + robust pose estimation (reference L2).
- ``backend``    — factor graphs, Gauss-Newton/LM solvers, pose graphs,
                   sliding-window bundle adjustment (reference L3).
- ``loopclosure``— BoW place recognition, persistent maps, relocalization.
- ``runtime``    — ingestion pipelines, control planes, supervision,
                   failure injection (reference L1/L4).
- ``parallel``   — device-mesh sharding of the tracking/solver steps.
- ``slam``       — SLAMSystem public API + runners (reference L5).
- ``eval``       — trajectory metrics, evaluation harness, regression
                   gates, CI runner, governance, readiness (reference L7).
- ``viz``        — dashboards and live path animation (reference L8).
"""

__version__ = "0.1.0"

# Geometry/solver correctness requires true-f32 matmuls. On TPU, f32
# matmuls otherwise run on the MXU with bf16 multiplicands (~3e-3 relative
# error on a 3x3 compose — fatal for Lie-group roundtrips and normal
# equations). Throughput-critical kernels that tolerate bf16 request lower
# precision explicitly at their call sites.
import os as _os

# Host CPU backend alongside the accelerator: the axon kernel env pins
# JAX_PLATFORMS=axon, which would leave the process without a CPU backend
# for the small-solve placement policy (core/hostdispatch.py — tiny
# backend solves cost ~100x their compute in tunnel round trips when
# dispatched to a remote chip). Appending "cpu" only ADDS a backend; the
# first-listed platform stays the default, so accelerator placement and
# every existing code path are unchanged. jax reads JAX_PLATFORMS at
# backend initialisation, which cannot have happened before the first
# mvslam_tpu import in a normal entry point. Opt out: MVSLAM_CPU_BACKEND=0.
if _os.environ.get("MVSLAM_CPU_BACKEND", "1") != "0":
    from mvslam_tpu.core.hostdispatch import with_cpu_platform as _wcp

    _plats = _os.environ.get("JAX_PLATFORMS", "")
    if _plats:
        _os.environ["JAX_PLATFORMS"] = _wcp(_plats)
    del _wcp, _plats

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: CLI entry points are separate processes, and
# first-compile over a tunneled TPU costs minutes. Opt out with
# MVSLAM_JAX_CACHE_DIR="".
#
# DISABLED for the tunneled `axon` backend (round 4): executables
# deserialized from the persistent cache DEADLOCK at their first device
# execution on that runtime — reproduced 3/3 on a freshly-written entry
# (write-compile runs fine, reload of the same entry hangs forever and can
# wedge the chip for every subsequent client). Fresh compiles are slow but
# correct, so on axon we always compile. This was the silent killer behind
# the r1–r3 driver-bench timeouts: any bench child that got a cache HIT
# deadlocked with zero stderr. Force the cache on at your own risk with
# MVSLAM_JAX_CACHE_DIR=<dir>.
_cache_dir = _os.environ.get("MVSLAM_JAX_CACHE_DIR")
if _cache_dir is None and not _os.environ.get("JAX_PLATFORMS", "").startswith("axon"):
    _cache_dir = _os.path.expanduser("~/.cache/mvslam_tpu_jax")
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
del _jax, _os, _cache_dir
