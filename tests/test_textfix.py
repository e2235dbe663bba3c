# -*- coding: utf-8 -*-
from __future__ import annotations

from pyspark.sql import Row

from pii_detector_spark.operators.textfix import fix_text_column, fix_text_py

CASES = [
    ("cafÃ© au lait", "café au lait"),            # single mojibake round
    ("cafÃƒÂ©", "café"),                          # double-encoded
    ("e\u0301clair", "\u00e9clair"),          # NFC composition
    ("a\r\nb\rc\x00d​", "a\nb\ncd"),        # newlines + controls + ZWSP
    ("plain ascii", "plain ascii"),               # passthrough
    ("xâ€œy", "x“y"),        # â€œ -> left curly quote
    ("1â€“2", "1–2"),                             # â€“ -> en dash
    ("Ã la carte", "Ã la carte"),                 # marker but invalid UTF-8: kept
    ("tab\tkept", "tab\tkept"),
    ("cafA\u0303\u00a9", "caf\u00e9"),         # decomposed mojibake, NFC-first
    ("﻿bom gone", "bom gone"),
]


class TestFixTextPy:
    def test_cases(self):
        for inp, want in CASES:
            assert fix_text_py(inp) == want, repr(inp)

    def test_none(self):
        assert fix_text_py(None) is None

    def test_idempotent(self):
        for inp, _ in CASES:
            once = fix_text_py(inp)
            assert fix_text_py(once) == once, repr(inp)


class TestFixTextColumn:
    def test_spark_matches_reference(self, spark):
        df = spark.createDataFrame(
            [Row(i=i, text=inp) for i, (inp, _) in enumerate(CASES)]
        )
        got = {
            r.i: r.fixed
            for r in df.select("i", fix_text_column("text").alias("fixed")).collect()
        }
        for i, (inp, want) in enumerate(CASES):
            assert got[i] == want, repr(inp)

    def test_null_preserved_and_arrow_batched(self, spark):
        df = spark.createDataFrame([Row(i=0, text=None), Row(i=1, text="cafÃ©")])
        out = df.select("i", fix_text_column("text").alias("fixed"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan      # vectorized, not row-at-a-time
        rows = {r.i: r.fixed for r in out.collect()}
        assert rows[0] is None and rows[1] == "café"
