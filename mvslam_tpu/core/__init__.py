"""Determinism, hashing, run artifacts, telemetry, persistence (reference L0/L6)."""

from mvslam_tpu.core.determinism import (
    DeterminismRegistry,
    build_registry,
    hash_config_path,
)
from mvslam_tpu.core.integrity import stable_hash, stable_event_digest
from mvslam_tpu.core.experiments import create_run_artifacts, write_resolved_config

__all__ = [
    "DeterminismRegistry",
    "build_registry",
    "hash_config_path",
    "stable_hash",
    "stable_event_digest",
    "create_run_artifacts",
    "write_resolved_config",
]
