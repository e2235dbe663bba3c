"""pii_detector_spark — a PySpark-native quality-filter + PII/toxicity-scrub engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference scanner (Yurasblv/pii-detector): language-ID, heuristic quality
rules, n-gram perplexity scoring, and a regex PII/credential scrub battery,
expressed as DataFrame transformations + Arrow-batched pandas UDFs over an
Iceberg-style table of Common-Crawl-style web pages

    web_pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Design notes
------------
* All detection/scrub semantics are defined once, as pure functions
  (``pii_detector_spark.functions``) shared by the vectorized pandas UDFs in
  ``pii_detector_spark.operators`` — zero per-row Python UDFs on the Spark
  side, Arrow batches only.
* Regex patterns, masking, hashing and region-tagging semantics mirror the
  reference (see citations in ``patterns.py`` / ``functions/masking.py``).
* Partitioning, skew-salting, lineage/metrics and checkpoint-resume live in
  ``plans/`` — explicit, cluster-scale-first.
"""

__version__ = "0.1.0"
