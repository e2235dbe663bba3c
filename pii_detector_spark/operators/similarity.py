"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact top-k neighbors: broadcast the (small)
  query set against the corpus; dot products via ``zip_with``+``aggregate``
  (JVM, no Python). At 100 TB the corpus side streams through the scan —
  the only shuffle is the per-query top-k, which AQE keeps tiny.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH signature
  (deterministic planes derived from md5 of the dimension index) buckets
  the corpus; queries search only their bucket. Recall < 1 by design;
  bucket count tunes the recall/cost trade.
* ``embedding_neardup_pairs`` — near-duplicate vector pairs within LSH
  buckets (cosine ≥ threshold), the embedding analogue of minhash dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one broadcast nested-loop + per-query window."""
    c = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        cosine(F.col("vec"), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplane_sign_bits(
    vec_col: Column, dim: int, n_planes: int, table: int = 0
) -> Column:
    """Deterministic random-hyperplane signature without a model artifact:
    plane p's weight for dimension d = ±1 from bit parity of md5(t:p:d).
    Computed as a JVM expression; the plane table folds to literals."""
    import hashlib

    bits = []
    for p in range(n_planes):
        signs = [
            1.0
            if (hashlib.md5(f"{table}:{p}:{d}".encode()).digest()[0] & 1)
            else -1.0
            for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def _bucket_array(
    vec: Column, dim: int, n_planes: int, n_tables: int
) -> Column:
    """One (table_id, bucket) struct per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                hyperplane_sign_bits(vec, dim, n_planes, table=t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via multi-table hyperplane LSH.

    Candidate recall ≈ 1-(1-p^planes)^tables where p = 1-θ/π; more tables
    buy recall, more planes cut candidates per bucket. Only same-bucket
    rows are ever scored — the corpus is never cross-joined.
    """
    c = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    ).select(
        "vec_id",
        "vec",
        F.explode(_bucket_array(F.col("vec"), dim, n_planes, n_tables)).alias("b"),
    ).select("vec_id", "vec", "b.table_id", "b.bucket")
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).select(
        "query_id",
        "qvec",
        F.explode(_bucket_array(F.col("qvec"), dim, n_planes, n_tables)).alias("b"),
    ).select("query_id", "qvec", "b.table_id", "b.bucket")

    cand = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "vec", "qvec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine(F.col("vec"), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 5,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF (inverted-file) cells: deterministic k-means.

    The scale path complementing ``lsh_bucket_topk``: centroids are learned
    (``iters`` Lloyd steps) instead of fixed hyperplanes, so cells adapt to
    the embedding distribution; queries probe their ``n_probe`` nearest
    cells and score only those cells' vectors.

    Determinism (no Date/now, no RNG): seed centroids are the vectors of
    the ``n_cells`` ids with the smallest ``md5(vec_id)``; per-cell means
    sum members in vec_id order. Everything data-sized stays distributed —
    only centroid matrices (n_cells × dim floats) touch the driver.
    Assignment is an Arrow-batched pandas UDF doing one numpy argmin per
    batch (a JVM expression form would be ``n_cells × dim`` interpreted
    higher-order ops per row — the known non-codegen trap).
    """
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    c = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    seeds = (
        c.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    centroids = np.array([list(r["vec"]) for r in seeds], dtype=np.float64)

    def _assign_udf(cent: np.ndarray):
        b = F.pandas_udf(
            lambda vecs: pd.Series(
                np.argmin(
                    (
                        (np.stack(vecs.map(np.asarray).to_numpy())[:, None, :]
                         - cent[None, :, :]) ** 2
                    ).sum(axis=2),
                    axis=1,
                ).astype(np.int64)
            ) if len(vecs) else pd.Series([], dtype="int64"),
            returnType="long",
        )
        return b

    # fixed-point quantization (2^20) makes the distributed per-cell sums
    # integer and therefore associative — identical centroids on every run
    # regardless of partition/merge order (float sums are not)
    Q = 1 << 20
    for _ in range(iters):
        assigned = c.withColumn("cell", _assign_udf(centroids)(F.col("vec")))
        sums = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.round(F.col("x") * Q).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_c = centroids.copy()  # empty cells keep their old centroid
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cell"], np.zeros(dim))[r["pos"]] = r["s"]
            cnt[r["cell"]] = r["n"]  # one exploded row per member per pos
        for cell in acc:
            new_c[cell] = acc[cell] / (max(cnt[cell], 1) * Q)
        centroids = new_c

    assigned = c.withColumn("cell", _assign_udf(centroids)(F.col("vec")))

    def _probe_udf(cent: np.ndarray, p: int):
        def fn(vecs):  # pd.Series -> pd.Series (pd local to ivf_topk)
            if not len(vecs):
                return pd.Series([], dtype="object")
            X = np.stack(vecs.map(np.asarray).to_numpy())
            d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d, axis=1, kind="stable")[:, :p]
            return pd.Series(list(order.astype(np.int64)))

        return F.pandas_udf(fn, returnType="array<long>")

    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).withColumn(
        "cell", F.explode(_probe_udf(centroids, n_probe)(F.col("qvec")))
    )
    cand = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id", "vec_id", cosine(F.col("vec"), F.col("qvec")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vector near-dup pairs: LSH-bucketed self-join + cosine verify."""
    base = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    ).withColumn("bucket", hyperplane_sign_bits(F.col("vec"), dim, n_planes))
    a = base.alias("a")
    b = base.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("vec").alias("vec_b"),
        "bucket",
    ).alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("vec_id_b"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("vec_id_b").alias("id_b"),
            cosine(F.col("a.vec"), F.col("vec_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
