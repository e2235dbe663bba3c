"""Connected components + canonical-doc selection (operators/clusters.py):
transitive closure over near-dup pairs in pure DataFrame ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from pii_detector_spark.operators.clusters import (
    canonicalize,
    connected_components,
    dedup_clusters,
    drop_near_duplicates,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_transitive_chain_and_separate_cluster(spark):
    # chain 1-2-3-4 (diameter 3: needs real propagation) + pair 10-11
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        (r["id"], r["comp"]) for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_long_path_converges(spark):
    # 0-1-2-...-12: worst-case diameter for min propagation
    pairs = _pairs(spark, [(i, i + 1) for i in range(12)])
    comp = connected_components(pairs)
    assert {r["comp"] for r in comp.collect()} == {0}
    assert comp.count() == 13


def test_100_hop_chain_converges_in_log_rounds(spark):
    """The r4 min-propagation guard fired on chains > max_iter hops;
    star alternation must converge a 100-hop chain WITHOUT raising and
    well inside the default 20-round budget (O(log n), not O(diameter))."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(100)])
    comp = connected_components(pairs)  # default max_iter=20
    rows = {(r["id"], r["comp"]) for r in comp.collect()}
    assert rows == {(i, 0) for i in range(101)}


def test_string_ids_still_supported(spark):
    """Url-keyed pair graphs (string ids) order lexicographically; the
    star alternation must handle them like the propagation loop did."""
    pairs = spark.createDataFrame(
        [("u-b", "u-c"), ("u-a", "u-b"), ("u-x", "u-y")],
        "id_a string, id_b string",
    )
    got = {
        (r["id"], r["comp"]) for r in connected_components(pairs).collect()
    }
    assert got == {
        ("u-a", "u-a"),
        ("u-b", "u-a"),
        ("u-c", "u-a"),
        ("u-x", "u-x"),
        ("u-y", "u-x"),
    }


def test_dedup_clusters_sizes(spark):
    pairs = _pairs(spark, [(5, 6), (6, 7), (20, 21)])
    got = {
        (r["doc_id"], r["component"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    assert got == {
        (5, 5, 3),
        (6, 5, 3),
        (7, 5, 3),
        (20, 20, 2),
        (21, 20, 2),
    }


def test_canonicalize_singletons_and_prefer_col(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (50, 0.1)],
        "doc_id long, quality double",
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    # no preference: min doc_id wins
    by_id = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in canonicalize(docs, pairs).collect()
    }
    assert by_id == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        50: (50, True),  # singleton: own component, canonical
    }
    # quality preference: 2 and 3 tie at 0.9 → min doc_id 2 wins
    by_q = {
        r["doc_id"]: r["is_canonical"]
        for r in canonicalize(docs, pairs, prefer_col="quality").collect()
    }
    assert by_q == {1: False, 2: True, 3: False, 50: True}


def test_drop_near_duplicates_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5)])
    kept = sorted(
        r["doc_id"] for r in drop_near_duplicates(docs, pairs).collect()
    )
    assert kept == [0, 3, 4, 6, 7]


def test_no_leaked_loop_persists(spark):
    """The iterative loop's per-round persists are all released; only the
    returned snapshot (localCheckpoint, GC-cleaned with the DataFrame)
    may remain."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    comp = connected_components(_pairs(spark, [(1, 2), (2, 3)]))
    comp.collect()
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_drop_near_duplicate_docs_url_keyed(spark):
    """Pipeline-level keep-one: MinHash pairs over url-keyed docs via the
    surrogate-id mapping; canonical = min url, unique docs untouched."""
    from pii_detector_spark.operators.clusters import drop_near_duplicate_docs

    dup = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest before the sun finally sets"
    )
    uniq = (
        "completely different content about distributed query engines "
        "processing petabytes of web text with vectorized operators daily"
    )
    docs = spark.createDataFrame(
        [
            ("https://a.example.com/1", dup),
            ("https://b.example.com/2", dup),
            ("https://c.example.com/3", uniq),
        ],
        "url string, scrubbed_text string",
    )
    kept = sorted(
        r["url"] for r in drop_near_duplicate_docs(docs).collect()
    )
    assert kept == ["https://a.example.com/1", "https://c.example.com/3"]


def test_bucketed_delta_join_shuffles_only_delta_side(spark):
    """100-TB shape of incremental dedup: with the corpus's banded keys
    stored band_key-bucketed, the delta band join must read the stored
    side bucketed (no Exchange above its scan) and produce the same pairs
    as the plain path."""
    from pyspark.sql import functions as F

    from pii_detector_spark.operators.delta_dedup import (
        minhash_pairs_delta,
        minhash_pairs_delta_bucketed,
        minhash_signatures,
        write_bucketed_bands,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon "
    )
    rows = [(i, base + f"doc {i} tail {i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, shingle_n=3).persist()
    new = sigs.filter(F.col("doc_id") % 10 == 0)

    spark.sql("DROP TABLE IF EXISTS t_bands")
    write_bucketed_bands(sigs, table="t_bands", buckets=4)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        plain = minhash_pairs_delta(sigs, new).collect()
        bucketed_df = minhash_pairs_delta_bucketed(
            spark, sigs, new, table="t_bands"
        )
        got = bucketed_df.collect()
        key = lambda r: (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        assert sorted(map(key, got)) == sorted(map(key, plain))

        # at corpus scale neither side broadcasts — disable broadcast to
        # pin the shuffle-join shape the bucketing is for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shaped = minhash_pairs_delta_bucketed(
            spark, sigs, new, table="t_bands"
        )
        shaped.collect()
        plan = shaped._jdf.queryExecution().executedPlan().toString()
        # the stored side scan is bucketed...
        n_bucketed_scans = plan.count("Bucketed: true")
        assert n_bucketed_scans > 0, plan
        # ...and no Exchange sits between that scan and the band join: per
        # printed instance of the join (AQE renders final + initial plans)
        # there is exactly ONE hashpartitioning(band_key) exchange — the
        # delta side; the bucketed corpus side reads shuffle-free
        import re as _re

        n_bandkey_exchanges = len(
            _re.findall(r"Exchange hashpartitioning\(band_key", plan)
        )
        assert n_bandkey_exchanges == n_bucketed_scans, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        sigs.unpersist()
        spark.sql("DROP TABLE IF EXISTS t_bands")
