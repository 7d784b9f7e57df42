"""Pipeline stages and query workloads (the engine's public query surface)."""
