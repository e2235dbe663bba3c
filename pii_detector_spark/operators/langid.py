"""Language-ID + perplexity operator — one Arrow-batched pandas UDF.

Model artifacts (char-trigram profiles, char-bigram LM) build lazily once
per executor process via ``lru_cache`` in ``functions/langmodels.py`` — the
broadcast-compiled-artifact pattern (SURVEY.md §4), same as the regex
battery. Two scores per document, one UDF call: fusing them halves Arrow
serialization vs separate UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from pii_detector_spark.functions.langmodels import perplexity, predict_lang

LANG_RESULT_TYPE = StructType(
    [
        StructField("lang_pred", StringType()),
        StructField("perplexity", DoubleType()),
    ]
)


def _langid_batch(texts: pd.Series) -> pd.DataFrame:
    langs: list[str] = []
    ppls: list[float] = []
    for t in texts:
        t = t or ""
        langs.append(predict_lang(t))
        p = perplexity(t)
        # Arrow chokes on inf in some writers; cap to a large sentinel that
        # still fails every threshold
        ppls.append(min(p, 1e9))
    return pd.DataFrame({"lang_pred": langs, "perplexity": ppls})


# nondeterministic marker keeps the UDF as its own projection layer (see
# sources/web_pages.py); the function is pure
langid_udf = F.pandas_udf(
    _langid_batch, returnType=LANG_RESULT_TYPE
).asNondeterministic()


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    res = langid_udf(F.col(text_col))
    return (
        df.withColumn("_lm", res)
        .withColumn("lang_pred", F.col("_lm.lang_pred"))
        .withColumn("perplexity", F.col("_lm.perplexity"))
        .drop("_lm")
    )
