"""Gopher top/dup n-gram character fractions (operators/repetition.py),
pinned by hand-computed examples."""

from __future__ import annotations

from pii_detector_spark.operators.repetition import (
    apply_repetition_rules,
    with_repetition_metrics,
)


def test_top_and_dup_fractions_hand_computed(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b" cnt=3
    # len=3 → 9/11; 5-grams = [a b a b a, b a b a b] each once → dup5 = 0
    # "x y x y x y x y": dup-5 grams: "x y x y x"×2, "y x y x y"×2
    # → (2*9 + 2*9)/15... n_chars=15; top2 "x y" cnt=4 len=3 → 12/15
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y x y x y x y"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in with_repetition_metrics(df).collect()
    }
    assert got[1]["n_chars"] == 11
    assert abs(got[1]["top_2gram_char_frac"] - 9 / 11) < 1e-12
    assert got[1]["dup_5gram_char_frac"] == 0.0
    assert abs(got[2]["top_2gram_char_frac"] - 12 / 15) < 1e-12
    assert abs(got[2]["dup_5gram_char_frac"] - 36 / 15) < 1e-12
    # empty text and too-short text: all-zero fractions, rows present
    for d in (3, 4):
        assert got[d]["top_2gram_char_frac"] == 0.0
        assert got[d]["dup_10gram_char_frac"] == 0.0


def test_apply_repetition_rules_first_failing(spark):
    # doc 2: 30 distinct words (all grams unique, cnt=1): n_chars=119,
    # top-n frac = longest gram / n_chars = 7/119, 11/119, 15/119 — all
    # under the Gopher gates (short docs trip them trivially: a unique
    # n-gram doc's top frac is gram_len/doc_len)
    unique = " ".join(f"w{i:02d}" for i in range(30))
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, unique)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["rep_keep"], r["rep_drop_reason"])
        for r in apply_repetition_rules(with_repetition_metrics(df)).collect()
    }
    # doc 1: top_2gram_char_frac = 9/11 > 0.20 → dropped by the FIRST rule
    assert out[1] == (False, "top_2gram")
    assert out[2] == (True, None)
