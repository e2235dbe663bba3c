"""Similarity-search operator tests on sf0.001 embeddings + constructed
vectors with known neighbor structure."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.99, 0.1, 0.0, 0.0]),   # close to 1
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0]),    # orthogonal to 1
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0, 0.0]),   # opposite of 1
        Row(vec_id=5, embedding=[1.0, 0.01, 0.0, 0.0]),   # near-dup of 1
    ]
    return spark.createDataFrame(rows)


def test_bruteforce_topk(vecs):
    from pii_detector_spark.operators.similarity import cosine_topk_bruteforce

    q = vecs.filter("vec_id = 1")
    out = cosine_topk_bruteforce(vecs, q, k=2).collect()
    ranked = [(r["vec_id"], r["rank"]) for r in out]
    assert ranked[0] == (5, 1)
    assert ranked[1] == (2, 2)
    c = {r["vec_id"]: r["cosine"] for r in out}
    assert math.isclose(c[5], 1.0, abs_tol=1e-3)


def test_bruteforce_on_testdata(spark):
    from pii_detector_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 3")
    out = cosine_topk_bruteforce(emb, q, k=5)
    rows = out.collect()
    assert len(rows) == 15  # 3 queries (vec_id 0,1,2) × 5
    for r in rows:
        assert -1.0001 <= r["cosine"] <= 1.0001


def test_lsh_bucket_recall(spark):
    """LSH top-1 should find the true nearest neighbor for most queries
    (same-bucket probability is high for near-identical vectors)."""
    from pii_detector_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_bucket_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 20")
    exact = {
        r["query_id"]: r["vec_id"]
        for r in cosine_topk_bruteforce(emb, q, k=1).collect()
    }
    approx = {
        r["query_id"]: r["vec_id"]
        for r in lsh_bucket_topk(emb, q, dim=64, k=1, n_planes=4).collect()
    }
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits / len(exact) >= 0.5, (hits, len(exact))


def test_embedding_neardup(vecs):
    from pii_detector_spark.operators.similarity import embedding_neardup_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(vecs, dim=4, threshold=0.99).collect()
    }
    assert (1, 5) in pairs
    assert (1, 4) not in pairs
    assert (1, 3) not in pairs


def test_ivf_topk_exhaustive_probe_equals_bruteforce(spark):
    """Probing every cell makes IVF exact: candidate set = whole corpus,
    so top-k must equal brute force."""
    from pyspark.sql import functions as F

    from pii_detector_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter("vec_id < 6")
    exact = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in cosine_topk_bruteforce(emb, q, k=3).collect()
    )
    ivf = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_topk(
            emb, q, dim=64, n_cells=8, n_probe=8, k=3, iters=1
        ).collect()
    )
    assert ivf == exact


def test_ivf_topk_deterministic_and_recalls(spark):
    from pyspark.sql import functions as F

    from pii_detector_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter("vec_id < 8")
    r1 = ivf_topk(emb, q, dim=64, n_cells=16, n_probe=4, k=3).collect()
    r2 = ivf_topk(emb, q, dim=64, n_cells=16, n_probe=4, k=3).collect()
    # fixed-point centroid sums → bit-identical output across runs
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    bf = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk_bruteforce(emb, q, k=3).collect()
    }
    iv = {(r["query_id"], r["vec_id"]) for r in r1}
    assert len(bf & iv) / len(bf) >= 0.5  # probing 4/16 cells
    # every query returns a full top-k
    from collections import Counter

    per_q = Counter(r["query_id"] for r in r1)
    assert all(v == 3 for v in per_q.values())


def test_ivf_incremental_assign_equals_full(spark):
    """Delta path: centroids trained on old vectors + frozen-assign of the
    delta must give the same exhaustive-probe top-k as one-shot ivf_topk
    over everything (both exact at n_probe=n_cells); the centroid
    persistence rows round-trip bit-exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    from pii_detector_spark.operators.similarity import (
        centroids_to_rows,
        ivf_assign,
        ivf_query,
        ivf_topk,
        ivf_train_centroids,
        rows_to_centroids,
    )

    rng = np.random.default_rng(11)
    dim = 16
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(60)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    old = e.filter(F.col("vec_id") % 6 != 0)
    new = e.filter(F.col("vec_id") % 6 == 0)
    queries = e.filter(F.col("vec_id") < 5)

    cent = ivf_train_centroids(old, dim=dim, n_cells=4, iters=2)
    crows = centroids_to_rows(cent)
    cent2 = rows_to_centroids(
        spark.createDataFrame(
            crows, "cell int, pos int, value double"
        ).collect(),
        n_cells=4,
        dim=dim,
    )
    assert np.array_equal(cent, cent2)

    def slim(df):
        return df.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").alias("vec"),
        )

    assigned = ivf_assign(slim(old), cent2).unionByName(
        ivf_assign(slim(new), cent2)
    )
    inc = ivf_query(assigned, queries, cent2, n_probe=4, k=3).collect()
    full = ivf_topk(
        e, queries, dim=dim, n_cells=4, n_probe=4, k=3, iters=2
    ).collect()

    def key(rs):
        return sorted(
            (r["query_id"], r["vec_id"], round(r["cosine"], 9), r["rank"])
            for r in rs
        )

    # exhaustive probing makes both exact regardless of centroid history
    assert key(inc) == key(full)
