"""Multi-chip sharding checks, isolated in a fresh interpreter.

The actual assertions live in ``parallel_checks.py`` (collected explicitly
by the child pytest below — the filename intentionally avoids the test_*
pattern so the outer run does not collect it twice).

Why a subprocess: executing the large meshed-superwindow programs late in
a long-lived suite process intermittently segfaults inside XLA:CPU's
execution of *unrelated* jitted programs (observed at 3 different call
sites across runs; RSS ~8.5 GB of live executables, threads steady — a
runtime race, not leakage we control). A fresh process running only these
checks has never crashed. Isolation keeps the suite green while exercising
the identical code; the persistent compile cache (conftest) makes the
child's compiles cheap on repeat runs.
"""

import os
import subprocess
import sys
from pathlib import Path


def test_parallel_checks_in_fresh_process():
    child = Path(__file__).parent / "parallel_checks.py"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", str(child), "-q", "--no-header", "-p", "no:cacheprovider"],
        env=dict(os.environ),
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(Path(__file__).parent.parent),
    )
    assert out.returncode == 0, (
        f"parallel checks failed (rc={out.returncode})\n"
        f"--- stdout ---\n{out.stdout[-8000:]}\n--- stderr ---\n{out.stderr[-4000:]}"
    )
