"""Evaluation, CI gating & benchmarks (reference L7)."""
