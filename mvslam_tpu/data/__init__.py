"""Dataset loaders and validation (reference L1 data plane)."""
