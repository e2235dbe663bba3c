"""Spark operators: vectorized (Arrow/pandas-UDF) and built-in-expression
transformations composing the quality-filter + PII-scrub pipeline, plus the
training-data-pipeline operators (dedup, similarity, text stats)."""
