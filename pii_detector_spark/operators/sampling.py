"""Deterministic sampling operators.

``stratified_sample`` is the quality-bucket sampling step of the public
LLM-data recipe (quality-weighted resampling: keep high-quality buckets at
a higher rate than low-quality ones, as in the GPT-3/LLaMA data mixes).
Spark-first shape: the keep decision is a pure per-row expression —
``md5(key || salt)`` compared against a per-bucket hex threshold — so the
whole operator is JVM codegen inside the scan, with **zero shuffle and
zero Python**, and the identical rows are kept at any cluster size, on any
partitioning, on every rerun (the property the reference's ``random.
sample`` 20-object sampling lacks; ``base_scan_service.py:193-231`` — same
L2 rationale as the flat ``hash_sample`` query).

The md5-hex-threshold encoding is engine-portable: every SQL engine with
``md5`` can reproduce the exact sample (hex strings compare uniformly:
'0'-'9' < 'a'-'f' in both Spark and DuckDB collations), which is how the
DuckDB oracle verifies the draw row for row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DIGITS = 8  # hex digits of md5 compared; 16^8 ~ 4.3e9 rate granularity


def rate_threshold(rate: float, digits: int = _DIGITS) -> str:
    """Hex threshold t such that P[md5_prefix < t] == floor-quantized
    ``rate``. rate>=1 returns 'g' (> every hex char, keeps all rows)."""
    if rate <= 0.0:
        return ""  # nothing sorts below the empty string -> keeps none
    n = int(rate * (16**digits))
    if n >= 16**digits:
        return "g"
    return format(n, f"0{digits}x")


def sample_flag(
    key: Column, rate: float, salt: str = "", digits: int = _DIGITS
) -> Column:
    """Boolean column: deterministically keep ``key`` with ``rate``."""
    thr = rate_threshold(rate, digits)
    prefix = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, digits)
    return prefix < F.lit(thr)


def stratified_sample(
    df: DataFrame,
    bucket_col: str,
    rates: dict[str, float],
    key_col: str = "url",
    salt: str = "",
    default_rate: float = 0.0,
    flag_col: str = "sampled",
) -> DataFrame:
    """Per-bucket deterministic sampling: adds ``flag_col`` (boolean).

    ``rates`` maps bucket value -> keep rate; buckets not listed use
    ``default_rate``. Filter on the flag to materialize the sample; the
    flag form keeps the operator composable (e.g. audit both sides).
    ``salt`` re-draws an independent sample without touching the keys.
    """
    expr = None
    for bucket, rate in rates.items():
        flag = sample_flag(F.col(key_col), rate, salt)
        expr = (
            F.when(F.col(bucket_col) == bucket, flag)
            if expr is None
            else expr.when(F.col(bucket_col) == bucket, flag)
        )
    dflt = sample_flag(F.col(key_col), default_rate, salt)
    expr = dflt if expr is None else expr.otherwise(dflt)
    return df.withColumn(flag_col, expr)
