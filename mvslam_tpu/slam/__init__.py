"""SLAM public API and run orchestration (reference L5)."""

from mvslam_tpu.slam.api import (
    FrameDiagnostics,
    SLAMRunResult,
    SLAMSystem,
    SLAMSystemConfig,
)

__all__ = ["SLAMSystem", "SLAMSystemConfig", "SLAMRunResult", "FrameDiagnostics"]
