"""Reusable distributed operators (generic over any DataFrame)."""
