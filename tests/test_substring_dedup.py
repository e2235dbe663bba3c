"""Exact substring (duplicated k-token window) dedup."""
import random

import pytest

from pii_detector_spark.operators.substring_dedup import (
    duplicate_window_marks,
    remove_duplicate_windows,
    remove_duplicate_windows_py,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _run(spark, texts, k):
    out = remove_duplicate_windows(_df(spark, texts), k=k)
    return {r["doc_id"]: r["text"] for r in out.collect()}


def test_cross_doc_and_within_doc_semantics(spark):
    texts = {
        0: "u0a u0b accept all cookies now u0c u0d",
        1: "u1a accept all cookies now u1b rep one two three rep one two three",
        2: "short doc here",
        3: "u3a u3b accept all cookies now end3",
    }
    got = _run(spark, texts, k=4)
    # canonical (min (doc_id, pos)) keeps the shared phrase; others cut it;
    # within-doc repeat keeps only its first occurrence; short doc passes
    assert got == {
        0: "u0a u0b accept all cookies now u0c u0d",
        1: "u1a u1b rep one two three",
        2: "short doc here",
        3: "u3a u3b end3",
    }
    assert got == remove_duplicate_windows_py(texts, k=4)


def test_overlapping_windows_merge_coverage(spark):
    # a 6-token shared run yields 3 overlapping duplicated 4-windows;
    # coverage merges them into one 6-token cut
    run = "s1 s2 s3 s4 s5 s6"
    texts = {0: f"a0 {run} b0", 1: f"a1 {run} b1"}
    got = _run(spark, texts, k=4)
    assert got[0] == f"a0 {run} b0"
    assert got[1] == "a1 b1"


def test_whole_doc_duplicate_and_whitespace_normalization(spark):
    texts = {
        0: "w1  w2\tw3\nw4",  # messy whitespace, canonical
        1: "w1 w2 w3 w4",     # exact dup at k=4 -> fully cut
    }
    got = _run(spark, texts, k=4)
    assert got == {0: "w1 w2 w3 w4", 1: ""}


def test_randomized_parity_vs_python_reference(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(30)]
    phrases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9)))
        for _ in range(6)
    ]
    texts = {}
    for d in range(40):
        parts = []
        for _ in range(rng.randint(1, 6)):
            if rng.random() < 0.5:
                parts.append(rng.choice(phrases))
            else:
                parts.append(
                    " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 7)))
                )
        texts[d] = " ".join(parts)
    for k in (3, 5):
        assert _run(spark, texts, k) == remove_duplicate_windows_py(texts, k)


def test_marks_only_non_canonical_occurrences(spark):
    texts = {
        5: "p q r s tail5",
        9: "p q r s tail9",
        7: "p q r s tail7",
    }
    marks = {
        (r["doc_id"], r["pos"])
        for r in duplicate_window_marks(_df(spark, texts), k=4).collect()
    }
    # canonical is (5, 0); the other two occurrences are marked
    assert marks == {(7, 0), (9, 0)}


def test_plan_shape(spark):
    texts = {0: "a b c d e", 1: "a b c d f"}
    df = _df(spark, texts)

    # candidate generation is pure JVM: no Python nodes anywhere
    marks_plan = duplicate_window_marks(df, k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in marks_plan

    # the full rebuild crosses into Python exactly once (the numpy sweep)
    plan = remove_duplicate_windows(df, k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_string_ids_preserved(spark):
    # url-keyed corpora: id type is preserved, canonical = lexicographic
    # least (url, pos)
    df = spark.createDataFrame(
        [
            ("https://b.com/1", "p q r s tailB"),
            ("https://a.com/2", "p q r s tailA"),
        ],
        "url string, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_windows(
            df, id_col="url", text_col="text", k=4
        ).collect()
    }
    assert out == {
        "https://a.com/2": "p q r s tailA",
        "https://b.com/1": "tailB",
    }


def test_empty_and_short_inputs(spark):
    texts = {0: "", 1: "one", 2: "   "}
    assert _run(spark, texts, k=4) == {0: "", 1: "one", 2: ""}
