"""Build the native C++ data-plane library (g++ → shared object).

The library is compiled on demand and cached under ``_build/`` keyed by a
SHA-256 of the source plus the compile command, so editing the C++ (or
changing flags) triggers exactly one rebuild. No pip/pybind11 involved:
plain g++ + libpng + zlib (all baked into the image), loaded via ctypes.
"""

from __future__ import annotations

from functools import lru_cache

import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent
_SRC = _NATIVE_DIR / "src" / "mvslam_native.cc"
_BUILD_DIR = _NATIVE_DIR / "_build"

_CXX_FLAGS = [
    "-O3",
    "-std=c++17",
    "-shared",
    "-fPIC",
    "-fvisibility=hidden",
    "-Wall",
    "-pthread",
]
# Host-tuned ISA for the Hamming matcher's popcount loop (AVX-512
# VPOPCNTQ on the measurement host). Tried first; if the compiler
# rejects it (cross/old toolchains), build() retries without.
_ARCH_FLAGS = ["-march=native"]
_LIBS = ["-lpng", "-lz"]


def _build_key(cxx: str) -> str:
    digest = hashlib.sha256()
    digest.update(_SRC.read_bytes())
    digest.update(" ".join([cxx] + _CXX_FLAGS + _ARCH_FLAGS + _LIBS).encode())
    return digest.hexdigest()[:16]


def library_path() -> Path:
    """Path the built library would live at (may not exist yet)."""
    return _BUILD_DIR / f"libmvslam_native_{_build_key(_compiler() or 'g++')}.so"


@lru_cache(maxsize=1)
def _compiler() -> Optional[str]:
    for cand in (os.environ.get("CXX"), "g++", "c++", "clang++"):
        if not cand:
            continue
        try:
            subprocess.run([cand, "--version"], capture_output=True, check=True)
            return cand
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def build(force: bool = False) -> Optional[Path]:
    """Compile the library if needed; returns its path or None on failure."""
    cxx = _compiler()
    if cxx is None:
        logger.warning("no C++ compiler found; native data-plane disabled")
        return None
    out = _BUILD_DIR / f"libmvslam_native_{_build_key(cxx)}.so"
    if out.exists() and not force:
        return out
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    # Build to a temp name then rename: concurrent builders (pytest-xdist,
    # parallel benchmarks) race benignly — rename is atomic on POSIX.
    with tempfile.NamedTemporaryFile(dir=_BUILD_DIR, suffix=".so", delete=False) as tmp:
        tmp_path = Path(tmp.name)
    proc = None
    for arch in (_ARCH_FLAGS, []):
        cmd = [cxx, *_CXX_FLAGS, *arch, "-o", str(tmp_path), str(_SRC), *_LIBS]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        except (OSError, subprocess.TimeoutExpired) as exc:
            tmp_path.unlink(missing_ok=True)
            logger.warning("native build failed to launch: %s", exc)
            return None
        if proc.returncode == 0:
            break
        logger.warning(
            "native build with flags %s failed, %s:\n%s",
            arch,
            "retrying generic" if arch else "giving up",
            proc.stderr[-4000:],
        )
    if proc is None or proc.returncode != 0:
        tmp_path.unlink(missing_ok=True)
        return None
    tmp_path.replace(out)
    logger.info("built native library: %s", out)
    return out


def main() -> int:
    logging.basicConfig(level=logging.INFO)
    path = build(force=True)
    if path is None:
        print("native build FAILED")
        return 1
    print(f"native build ok: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
