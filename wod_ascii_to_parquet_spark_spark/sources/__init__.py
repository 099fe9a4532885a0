"""Data sources: WOD fixed-width ASCII (distributed parse), parquet, discovery."""
