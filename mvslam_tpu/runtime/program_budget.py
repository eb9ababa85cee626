"""Compiled-program population guard for long-lived engine processes.

Root cause being bounded (VERDICT r4 #7 / r5 item 9): XLA:CPU keeps every
compiled executable alive inside jit caches for the life of the process.
A long SLAM session compiles many distinct programs — window BA at each
bucketed window size, pose-graph GN at each graph bucket, meshed
superwindows — and on this jaxlib an ~8.5 GB population of live
executables intermittently crashes the *runtime itself* (SIGSEGV/SIGABRT
inside unrelated jitted programs; observed at 4 distinct call sites across
long suite runs, see ``tests/test_parallel.py`` and
``docs/KNOWN_ISSUES.md``). The test suite quarantines this per module
(``tests/conftest.py``); this guard is the production-engine equivalent:
an RSS budget checked at a coarse cadence, evicting every jit cache when
crossed. Re-traces after an eviction are repaid from the persistent
compile cache where enabled (CPU), or by fresh compiles on axon (where
the persistent cache is unusable — see ``mvslam_tpu/__init__.py``).

The reference's structural analog is its bounded buffers / LRU feature
cache (``feature_control_plane.py:188-245``): no unbounded resident state
in a long-lived process.
"""

from __future__ import annotations

import gc
import os
from dataclasses import dataclass


def process_rss_gb() -> float:
    """Resident set size of this process in GB (inf when unmeasurable,
    so callers on exotic platforms fail toward eviction-safe behavior
    only when a budget is configured)."""
    try:
        with open("/proc/self/statm") as fh:
            pages = int(fh.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, ValueError, IndexError):
        return float("inf")


@dataclass
class ProgramCacheGuard:
    """Evict jit caches when process RSS crosses ``budget_gb``.

    ``tick()`` is cheap (one /proc read every ``check_every`` calls) and
    is called once per device dispatch by the windowed engine. Returns
    True when an eviction happened (exposed for telemetry/tests).
    ``budget_gb <= 0`` disables the guard.
    """

    budget_gb: float = 6.0
    check_every: int = 16
    _calls: int = 0
    evictions: int = 0

    def tick(self) -> bool:
        if self.budget_gb <= 0:
            return False
        self._calls += 1
        if self._calls % self.check_every:
            return False
        if process_rss_gb() <= self.budget_gb:
            return False
        import jax

        jax.clear_caches()
        gc.collect()
        self.evictions += 1
        return True
