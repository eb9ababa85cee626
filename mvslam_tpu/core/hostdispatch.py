"""Latency-aware placement for small backend solves.

Measured on the round-5 rig (TPU v5e behind a network tunnel): a program
launch costs ~40 ms and a device->host fetch ~135 ms — with degraded
phases of seconds to minutes — while the backend's latency-critical
solves (window-BA pair gate, the BA solve itself, pose-graph GN, BoW
histogram/query, loop geometry) are microsecond-to-millisecond programs
over a few hundred rows. Dispatching those to the remote chip multiplies
their cost ~100x and made the full SLAM pipeline 10x slower than its own
tracking stage (r4: 0.81 fps full vs 13 fps tracking-only). The MXU earns
its keep on the batched tracking windows, large RANSAC hypothesis
batches, and the meshed solver paths — which stay on the accelerator.

This module places SMALL solves on the host CPU *backend* — the same JAX
programs, compiled by XLA:CPU, placed via :func:`jax.default_device` —
when BOTH hold:

- the process has a CPU backend alongside the accelerator
  (``JAX_PLATFORMS=axon,cpu``; ``mvslam_tpu/__init__`` arranges this
  before jax initialises — see :func:`with_cpu_platform`), and
- the default backend is an accelerator. The CI environment runs
  CPU-only, where this module is a no-op and numerics are unchanged —
  every test and committed accuracy baseline exercises exactly the same
  XLA:CPU programs as before.

``jax.default_device`` only steers *uncommitted* arrays, so call sites
wrap the whole solve — input ``jnp.asarray``/``device_put`` staging, PRNG
key creation, and the jitted call — in one :func:`small_solve_scope`.
The scope is thread-local (JAX's config stack), so the engine's tracking
dispatches in other threads are unaffected.

Env contract:

- ``MVSLAM_SMALL_SOLVE=device`` — force every solve back to the default
  accelerator (pre-r5 behavior; use on locally-attached chips where a
  round trip is microseconds, or to A/B the placement).
- ``MVSLAM_SMALL_SOLVE=host`` — force host placement even when the
  default platform is already CPU (placement no-op; used by tests to
  exercise the scope machinery).
- ``MVSLAM_SMALL_SOLVE=auto`` (default) — host CPU iff the default
  backend is not CPU and a CPU backend exists.

There is no reference counterpart to cite: the reference is CPU-only, so
every solve is trivially "host-placed". This module is the piece of the
TPU redesign that keeps its latency story honest on real hardware.
"""

from __future__ import annotations

import os
from contextlib import nullcontext

__all__ = ["with_cpu_platform", "small_solve_device", "small_solve_scope"]


def with_cpu_platform(platforms: str) -> str:
    """Return ``platforms`` (a ``JAX_PLATFORMS`` value) with ``cpu`` appended.

    Pure string logic so it is unit-testable without touching process
    state. An empty/unset value is returned unchanged: jax then
    auto-initialises every available platform, which already includes the
    CPU. The first platform in the list stays first, so the default
    backend (e.g. ``axon``) is unchanged — this only ADDS a host backend
    for :func:`small_solve_scope` to place tiny programs on.
    """
    names = [p.strip() for p in platforms.split(",") if p.strip()]
    if not names or "cpu" in names:
        return platforms
    return ",".join(names + ["cpu"])


def small_solve_device():
    """The host CPU device small solves should run on, or None.

    None means "keep default placement" — either because the default
    backend already IS the CPU (CI), because no CPU backend exists in
    this process (``JAX_PLATFORMS`` pinned without ``cpu`` before
    ``mvslam_tpu`` imported), or because ``MVSLAM_SMALL_SOLVE=device``.
    """
    mode = os.environ.get("MVSLAM_SMALL_SOLVE", "auto")
    if mode == "device":
        return None
    import jax

    try:
        default = jax.devices()[0]
    except RuntimeError:
        return None
    if mode != "host" and default.platform == "cpu":
        return None
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        return None
    return cpus[0]


def small_solve_scope():
    """Context manager placing uncommitted work on the small-solve device.

    ``nullcontext`` when :func:`small_solve_device` is None, so wrapping a
    call site is always safe and free in CPU-only environments.
    """
    dev = small_solve_device()
    if dev is None:
        return nullcontext()
    import jax

    return jax.default_device(dev)
