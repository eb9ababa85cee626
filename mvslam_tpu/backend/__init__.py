"""Mapping & optimization back-end: keyframes, factor graphs, solvers,
pose graphs, bundle adjustment (reference L3)."""
