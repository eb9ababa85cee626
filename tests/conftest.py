"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Tests validate multi-chip sharding logic without TPU hardware, per the
framework's parallel design (mesh over frames / RANSAC hypotheses).
"""

import os
import sys
from pathlib import Path

# The axon kernel env presets JAX_PLATFORMS=axon — override, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MVSLAM_JAX_CACHE_DIR"] = ""  # XLA:CPU AOT cache mismatches across machines
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

# jax is pre-imported by the axon sitecustomize before conftest runs, so the
# env var alone isn't authoritative; the config flag is read at backend init.
jax.config.update("jax_platforms", "cpu")
