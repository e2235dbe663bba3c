"""Semantic dedup (SemDeDup-style) — verdicts vs a brute-force python
oracle, multi-cell locality, delta path, and the giant-cell guard."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pii_detector_spark.operators.semdedup import semantic_dedup

SF = "/root/testdata/sf0.001"


def _brute_drop_set(rows, tau):
    """Global EXISTS rule: x dropped iff some y with id<x has cos>=tau."""
    ids = sorted(r[0] for r in rows)
    vec = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0.0 or nb == 0.0:
            return 0.0
        return float(a @ b / (na * nb))

    dropped = set()
    for i, x in enumerate(ids):
        if any(cos(vec[x], vec[y]) >= tau for y in ids[:i]):
            dropped.add(x)
    return dropped


def _planted(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.999, 0.01, 0.0]),   # dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),
        (6, [0.7071, 0.7071, 0.0, 0.0]),  # between 1 and 3, not a dup
        (7, [1.0, 0.001, 0.0, 0.0]),    # dup of 1 (and of 2): chain
        (8, [0.0, 0.0, 0.0, 0.0]),      # zero vector: never similar
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_single_cell_matches_brute_force(spark):
    rows, df = _planted(spark)
    out = semantic_dedup(df, dim=4, tau=0.99, n_cells=1, iters=1)
    got = {r["vec_id"]: r["dropped"] for r in out.collect()}
    want = _brute_drop_set(rows, 0.99)
    assert set(got) == {r[0] for r in rows}
    for vid, dropped in got.items():
        assert dropped == (vid in want), vid


def test_multi_cell_only_prunes_within_cells(spark):
    """With real clustering, a drop needs a same-cell dominator; every
    drop the operator reports must be justified by the EXISTS rule
    restricted to its own cell, and same-cell dups must still drop."""
    rows, df = _planted(spark)
    out = semantic_dedup(df, dim=4, tau=0.99, n_cells=3, iters=2)
    res = {r["vec_id"]: (r["cell"], r["dropped"]) for r in out.collect()}
    assert len(res) == len(rows)
    vec = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    for vid, (cell, dropped) in res.items():
        peers = [
            y for y, (c, _) in res.items() if c == cell and y < vid
        ]

        def cos(a, b):
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            return 0.0 if na == 0.0 or nb == 0.0 else float(
                a @ b / (na * nb)
            )

        want = any(cos(vec[vid], vec[y]) >= 0.99 for y in peers)
        assert dropped == want, (vid, cell)


def test_testdata_embeddings_deterministic(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    a = semantic_dedup(emb, dim=64, tau=0.2, n_cells=8, iters=1)
    b = semantic_dedup(
        emb.repartition(7), dim=64, tau=0.2, n_cells=8, iters=1
    )
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb  # partitioning-invariant verdicts
    assert any(r[2] for r in ka)  # tau=0.2 on 64-dim: some drops happen


def test_delta_path_frozen_centroids(spark):
    """Delta contract: train centroids on the old corpus, prune old+new
    under the frozen matrix — equals the one-shot run with the same
    centroids (no re-cluster on append)."""
    from pii_detector_spark.operators.similarity import ivf_train_centroids
    from pyspark.sql import functions as F

    rows, df = _planted(spark)
    old = df.filter(F.col("vec_id") <= 6)
    cent = ivf_train_centroids(
        old.select(
            F.col("vec_id"), F.col("embedding").alias("vec")
        ),
        dim=4,
        n_cells=2,
        iters=1,
        id_col="vec_id",
        vec_col="vec",
    )
    full = semantic_dedup(df, dim=4, tau=0.99, centroids=cent)
    again = semantic_dedup(df, dim=4, tau=0.99, centroids=cent)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_string_ids_url_keyed(spark):
    """Web corpora key by url: id type passes through, dominance is
    lexicographic (matching a SQL EXISTS on the same column)."""
    rows, df = _planted(spark)
    sdf = df.selectExpr(
        "concat('https://ex.com/', lpad(cast(vec_id as string), 3, '0')) "
        "AS vec_id",
        "embedding",
    )
    out = semantic_dedup(sdf, dim=4, tau=0.99, n_cells=1, iters=1)
    got = {r["vec_id"]: r["dropped"] for r in out.collect()}
    srows = [(f"https://ex.com/{r[0]:03d}", r[1]) for r in rows]
    want = _brute_drop_set(srows, 0.99)
    assert {k for k, v in got.items() if v} == want
    assert out.schema["vec_id"].dataType.simpleString() == "string"


def test_giant_cell_guard_raises(spark):
    _, df = _planted(spark)
    with pytest.raises(Exception, match="max_cell_rows"):
        semantic_dedup(
            df, dim=4, tau=0.99, n_cells=1, iters=1, max_cell_rows=3
        ).collect()


def test_low_centroid_sim_keep_rule(spark):
    """Paper rule: per duplicate group, the survivor is the member least
    similar to the cell centroid; drop COUNT matches the min_id rule
    (same groups, one survivor each)."""
    import numpy as np
    from pii_detector_spark.operators.semdedup import semantic_dedup as sd

    # one cell (n_cells=1): centroid ≈ mean. Group {1,2,7} are mutual
    # dups of [1,0,0,0]-ish; 2 is nudged furthest from the mean.
    rows, df = _planted(spark)
    out = sd(df, dim=4, tau=0.99, n_cells=1, iters=1,
             keep="low_centroid_sim")
    got = {r["vec_id"]: r["dropped"] for r in out.collect()}
    baseline = sd(df, dim=4, tau=0.99, n_cells=1, iters=1)
    base = {r["vec_id"]: r["dropped"] for r in baseline.collect()}
    assert sum(got.values()) == sum(base.values())  # same group structure
    # exactly one survivor among the {1,2,7} duplicate group
    grp = [1, 2, 7]
    assert sum(1 for g in grp if not got[g]) == 1
    # the survivor is the argmin of centroid cosine within the group
    vec = {r[0]: np.asarray(r[1]) for r in rows}
    X = np.stack([vec[i] for i in sorted(vec)])
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    # centroid after one deterministic Lloyd step over the single cell
    c = X.mean(axis=0)
    c = c / np.linalg.norm(c)
    sims = {i: float((vec[i] / max(np.linalg.norm(vec[i]), 1e-12)) @ c)
            for i in grp}
    survivor = min(grp, key=lambda i: (sims[i], i))
    assert not got[survivor] and all(got[i] for i in grp if i != survivor)


def test_keep_rule_validated(spark):
    import pytest as _pt
    from pii_detector_spark.operators.semdedup import semantic_dedup as sd

    _, df = _planted(spark)
    with _pt.raises(ValueError, match="keep rule"):
        sd(df, dim=4, keep="bogus")


def test_duplicate_ids_follow_strict_exists(spark):
    """Two rows sharing an id with cos>=tau: neither has a STRICTLY
    smaller dominator, so neither drops (matching the SQL EXISTS rule);
    a genuinely larger id still drops."""
    rows = [
        (5, [1.0, 0.0, 0.0, 0.0]),
        (5, [0.999, 0.01, 0.0, 0.0]),   # same id, near-dup
        (9, [1.0, 0.001, 0.0, 0.0]),    # larger id, dup of both
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, dim=4, tau=0.99, n_cells=1, iters=1).collect()
    verdicts = sorted((r["vec_id"], r["dropped"]) for r in out)
    assert verdicts == [(5, False), (5, False), (9, True)]
