"""Sources: table IO seam (parquet / Iceberg) and multimodal columns."""
