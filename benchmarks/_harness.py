"""Shared micro-benchmark harness.

Reference benchmark pattern (SURVEY §2.8): build a synthetic workload →
``tracemalloc.start()`` + ``perf_counter`` → print a JSON report with
throughput and peak-memory delta. Every script prints one JSON object per
metric (parseable by ``mvslam_tpu.eval.governance``).
"""

from __future__ import annotations

import json
import time
import tracemalloc
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional


@contextmanager
def measured(report: Dict[str, Any]):
    """Populate report['elapsed_s'] and report['peak_memory_mb']."""
    tracemalloc.start()
    start = time.perf_counter()
    try:
        yield
    finally:
        report["elapsed_s"] = round(time.perf_counter() - start, 6)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        report["peak_memory_mb"] = round(peak / (1024 * 1024), 3)


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(float(value), 6), "unit": unit, **extra}))


def run_benchmark(
    name: str,
    workload: Callable[[], Any],
    items: Optional[int] = None,
    unit: str = "items/s",
) -> Dict[str, Any]:
    """Run a workload once under measurement; emit throughput + memory."""
    report: Dict[str, Any] = {}
    with measured(report):
        result = workload()
    if items:
        emit(name, items / max(report["elapsed_s"], 1e-12), unit, **report)
    else:
        emit(name, report["elapsed_s"], "s", **report)
    return {"result": result, **report}
