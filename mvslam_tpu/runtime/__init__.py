"""Host runtime: ingestion pipelines, control planes, supervision,
failure injection (reference L1/L4)."""
