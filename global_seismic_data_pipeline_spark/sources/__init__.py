"""Data sources: parquet catalog, GeoJSON flattener, USGS REST client."""
