"""Spark-side functions: vectorized sanitize UDFs, SQL-shaped column
expressions, and the training-data-pipeline operator library (dedup,
similarity, text analysis, multimodal plumbing)."""
