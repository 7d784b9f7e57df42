"""Native column-expression libraries (no Python UDFs in the hot path)."""
