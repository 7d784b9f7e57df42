"""Structured Streaming façade over the batch medallion semantics."""
