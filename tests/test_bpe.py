"""BPE training + encoding: hand-derivable merge sequences, count-path
equivalence, determinism, and the classic paper example."""

from __future__ import annotations

from pii_detector_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_token_counts,
    encode_text,
    train_bpe,
    word_counts,
)

SF = "/root/testdata/sf0.001"


def test_paper_example_merges():
    """Sennrich et al.'s worked example: vocab {low:5, lower:2,
    newest:6, widest:3} — first merges are (e,s), (es,t), (est,</w>)."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(counts, n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW)]


def test_encode_follows_merge_ranks():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(counts, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # a trained word reduces further than an unseen one
    assert len(encode_text("newest", ranks)) < len(
        encode_text("zzyzzy", ranks)
    )
    # unseen characters stay as singletons + EOW
    assert encode_text("qqq", ranks) == ["q", "q", "q", EOW]
    assert encode_text("", ranks) == []
    assert encode_text(None, ranks) == []


def test_distributed_training_matches_local_counts(spark):
    """word_counts → train_bpe equals training from hand counts; the
    corpus pass and the merge loop compose exactly."""
    texts = ["low low low low low lower lower", "newest " * 6 + "widest " * 3]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges_dist = train_bpe(word_counts(df), n_merges=3)
    merges_local = train_bpe(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 3
    )
    assert merges_dist == merges_local


def test_training_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    m1 = train_bpe(word_counts(docs), n_merges=20)
    m2 = train_bpe(word_counts(docs.repartition(7)), n_merges=20)
    assert m1 == m2 and len(m1) == 20


def test_token_counts_and_encode_agree(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    merges = train_bpe(word_counts(docs), n_merges=30)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    toks = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    assert set(counts) == set(toks)
    for k in counts:
        assert counts[k] == len(toks[k])
        # merges only ever shrink the symbol stream
        n_chars = None
    # python-side cross-check on one doc
    row = docs.limit(1).collect()[0]
    ranks = {p: i for i, p in enumerate(merges)}
    assert counts[row["doc_id"]] == len(encode_text(row["text"], ranks))


def test_merge_stops_when_dry():
    # every word unique, freq 1 → no pair reaches freq 2 → no merges
    assert train_bpe([("ab", 1), ("cd", 1)], n_merges=5) == []


def test_encode_shuffle_free(spark):
    """Scale-shape pin: encoding is scan → Arrow UDF, no exchange."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
    )
    merges = train_bpe(word_counts(docs.limit(50)), n_merges=5)
    plan = (
        bpe_token_counts(docs, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "Python" in plan


def test_whitespace_class_tokenization(spark):
    """Newlines/tabs are separators, not word characters — no
    newline-joined pseudo-words in the vocabulary."""
    df = spark.createDataFrame(
        [("end.\nStart\tmid  end.",)], "text string"
    )
    got = {r["word"]: r["freq"] for r in word_counts(df).collect()}
    assert got == {"end.": 2, "Start": 1, "mid": 1}
    ranks = {}
    assert encode_text("a\nb", ranks) == ["a", EOW, "b", EOW]


def test_train_bpe_bounds_driver_collect(spark):
    """Hapax-heavy corpus: min_freq drops the long tail BEFORE the driver
    collect (the 100-TB driver-OOM guard), and the planted merge sequence
    is unchanged when every real word clears the cutoff."""
    from pyspark.sql import functions as F

    junk = " ".join(f"junk{i:04d}" for i in range(500))
    df = spark.createDataFrame(
        [("low low lower newest widest",)] * 10 + [(junk,)],
        "text string",
    )
    wc = word_counts(df)
    # the exact relation train_bpe collects (freq >= 2): row-count pin —
    # the 500 hapax tokens never reach the driver
    assert wc.filter(F.col("freq") >= 2).count() == 4
    clean = word_counts(
        spark.createDataFrame(
            [("low low lower newest widest",)] * 10, "text string"
        )
    )
    assert train_bpe(wc, n_merges=4) == train_bpe(clean, n_merges=4)


def test_train_bpe_max_words_cap_deterministic():
    """The top-K vocabulary cap keeps the most frequent words with a
    deterministic (freq desc, word asc) cut, identically on the list
    path."""
    counts = [(f"w{i}x", 5) for i in range(10)] + [("aaaa", 9)]
    capped = train_bpe(counts, 2, min_freq=1, max_words=1)
    assert capped == train_bpe([("aaaa", 9)], 2, min_freq=1)
    # duplicate word entries aggregate before the min_freq filter
    assert train_bpe(
        [("abab", 1), ("abab", 1)], 1, min_freq=2
    ) == train_bpe([("abab", 2)], 1, min_freq=2)
