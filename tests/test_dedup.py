"""Dedup operator tests: constructed corpora with known duplicate structure
plus sf0.001 documents testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a + " extra"
    c = "completely different content about spark partitions and shuffles here"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=a),
            Row(doc_id=2, text=a),          # exact dup of 1
            Row(doc_id=3, text=b),          # near dup of 1/2
            Row(doc_id=4, text=c),
            Row(doc_id=5, text=""),
        ]
    )


def test_exact_dedup(docs):
    from pii_detector_spark.operators.dedup import exact_dedup

    out = {r["canonical_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2
    assert out[3] == 1
    assert out[4] == 1


def test_minhash_lsh_finds_near_dups(docs):
    from pii_detector_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, shingle_n=3, jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert all(4 not in p for p in pairs)


def test_ngram_jaccard_pairs(docs):
    from pii_detector_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_ngram_jaccard_cap_drops_boilerplate_only_pairs(spark):
    from pii_detector_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "accept all cookies to continue"
    rows = [
        Row(doc_id=1, text=f"{boiler} unique alpha text one two"),
        Row(doc_id=2, text=f"{boiler} other beta content three four"),
        Row(doc_id=3, text=f"{boiler} unique alpha text one two"),  # dup of 1
        Row(doc_id=4, text=f"{boiler} gamma delta epsilon five six"),
    ]
    df = spark.createDataFrame(rows)
    # cap=2: the boilerplate shingles (df=4) are excluded from candidate
    # generation, so pairs sharing ONLY boilerplate disappear; the true dup
    # pair (1,3) still surfaces through its unique shingles and is verified
    # with full exact jaccard (=1.0)
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, shingle_n=3, threshold=0.2, max_docs_per_shingle=2
        ).collect()
    }
    assert capped[(1, 3)] == 1.0
    assert (1, 2) not in capped and (2, 4) not in capped
    # exact mode keeps the boilerplate-only pairs
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, shingle_n=3, threshold=0.2, max_docs_per_shingle=None
        ).collect()
    }
    assert (1, 2) in exact and (1, 3) in exact


def test_simhash_similarity(docs):
    from pii_detector_spark.operators.dedup import simhash64

    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sims[1] == sims[2]  # identical text → identical simhash
    # near dup differs in few bits; unrelated differs in many
    ham_near = bin(sims[1] ^ sims[3]).count("1")
    ham_far = bin(sims[1] ^ sims[4]).count("1")
    assert ham_near < ham_far
    assert sims[5] == 0


def test_exact_dedup_on_testdata(spark):
    from pii_detector_spark.operators.dedup import exact_dedup

    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = exact_dedup(df)
    # sf0.001 documents are all distinct
    assert out.count() == df.count()
    assert out.agg({"dup_count": "sum"}).collect()[0][0] == df.count()


def test_shingles_expression(spark):
    from pii_detector_spark.operators.dedup import shingles_col

    df = spark.createDataFrame([Row(text="a b c d"), Row(text="a"), Row(text="")])
    rows = df.select(shingles_col(2).alias("s")).collect()
    assert sorted(rows[0]["s"]) == ["a b", "b c", "c d"]
    assert rows[1]["s"] == []
    assert rows[2]["s"] == []


def test_boilerplate_shingles(spark):
    from pii_detector_spark.operators.dedup import boilerplate_shingles

    boiler = "accept all cookies to continue browsing"
    rows = [
        Row(doc_id=1, text=f"{boiler} unique alpha text one"),
        Row(doc_id=2, text=f"{boiler} other beta content two"),
        Row(doc_id=3, text="entirely unrelated content about spark plans"),
    ]
    out = boilerplate_shingles(
        spark.createDataFrame(rows), shingle_n=3, min_doc_freq=2
    ).collect()
    # the boilerplate prefix yields 4 shared trigrams; each seen in docs 1+2
    assert len(out) == 4
    assert all(r["doc_freq"] == 2 and r["first_doc_id"] == 1 for r in out)


def test_remove_boilerplate_lines(spark):
    from pii_detector_spark.operators.dedup import remove_boilerplate_lines

    rows = [
        Row(doc_id=1, text="cookie banner\nreal content one\n\nfooter legal"),
        Row(doc_id=2, text="cookie banner\nreal content two\nfooter legal"),
        Row(doc_id=3, text="cookie banner\nonly boilerplate here\nfooter legal"),
        Row(doc_id=4, text="standalone document with its own text"),
        Row(doc_id=5, text=""),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            spark.createDataFrame(rows), min_doc_freq=2
        ).collect()
    }
    # repeated lines removed everywhere; unique lines survive in order;
    # empty lines are structure and disappear
    assert out[1] == "real content one"
    assert out[2] == "real content two"
    assert out[3] == "only boilerplate here"
    assert out[4] == "standalone document with its own text"
    assert out[5] == ""


def test_simhash_pairs_banding_and_hamming_verify(spark):
    """Banded Hamming join: identical texts pair at hamming 0; a searched
    one-word variant with a KNOWN small hamming (computed by a pure-Python
    simhash replica) is found via the pigeonhole banding; far texts are
    excluded; max_hamming >= bands raises."""
    import hashlib as _hl

    import pytest as _pytest

    from pii_detector_spark.operators.dedup import simhash_pairs

    base_words = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    ).split()

    def py_simhash(words):
        votes = [0] * 60
        for w in set(words):
            h = int(_hl.md5(w.encode()).hexdigest()[:15], 16)
            for i in range(60):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(60) if votes[i] > 0)

    ref = py_simhash(base_words + ["anchor"])
    near_word, near_h = None, None
    for cand in (f"w{i}" for i in range(3000)):
        h = bin(ref ^ py_simhash(base_words + [cand])).count("1")
        if 1 <= h <= 3:
            near_word, near_h = cand, h
            break
    assert near_word is not None, "no close variant found in search space"

    far_text = "totally disjoint vocabulary set one two three four five six"
    rows = [
        (1, " ".join(base_words + ["anchor"])),
        (2, " ".join(base_words + ["anchor"])),   # identical → hamming 0
        (3, " ".join(base_words + [near_word])),  # known small hamming
        (4, far_text),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == near_h and got[(2, 3)] == near_h
    assert not any(4 in k for k in got)

    with _pytest.raises(ValueError, match="bands - 1"):
        simhash_pairs(df, max_hamming=4, bands=4)
