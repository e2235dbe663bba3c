"""Dedup canonicalization: near-dup PAIRS → connected components →
one canonical document per cluster.

The missing last mile after minhash/simhash/ngram/embedding pair emission
(``operators/dedup.py``, ``operators/similarity.py``): a training-data
pipeline keeps ONE representative per duplicate cluster, and clusters are
the transitive closure of the pair graph (A~B, B~C ⇒ {A,B,C} even when
A≁C directly).

Spark-first shape — iterative min-label propagation in pure DataFrame ops
(the hash-to-min variant of map-reduce connected components; no driver-side
graph, no GraphX):

* labels start as each vertex's own id; every round each vertex takes the
  min of its label and its neighbors' labels (edge join + groupBy-min);
  converges to the component's min id in ≤ graph-diameter rounds.
* each round materializes via the convergence check (a changed-count job),
  persists its labels and unpersists the previous round's — bounded
  memory, early exit the first round nothing changes.
* near-dup graphs are overwhelmingly tiny cliques/chains (diameter ≤ 3-4),
  so round count is small and each round is one shuffle join + one
  shuffle agg over (id, id) rows — 16 bytes/vertex, never text.
* the returned labels are snapshot via ``localCheckpoint`` so every loop
  persist can be dropped before returning — no cached relations outlive
  the call (checkpoint blocks are GC-cleaned with the DataFrame).

The reference has no dedup canonicalization (it deduplicates scan WORK by
url, ``base_scan_service.py:431-447``); this implements the standard
map-reduce CC construction (Vassilvitskii et al.'s small-star/large-star
family; PAPERS.md) in its simplest min-propagation form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component =
    min id of the connected component (any orderable id type).

    ``max_iter`` bounds pathological chain graphs (a length-k path needs
    ~k rounds); the loop exits early on convergence, which for real
    near-dup graphs happens in a handful of rounds.
    """
    sym = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct()
    verts = sym.select(F.col("src").alias("id")).distinct()
    # self-loops make each round ONE join+agg with a SINGLE reference to
    # the previous labels (a labels ∪ propagate form references labels
    # twice, doubling the logical plan every round — exponential analysis
    # cost; the classic iterative-DataFrame trap)
    # the self-loop row carries each dst's OWN previous label through the
    # propagation join (is_self marks it), so per-round convergence is a
    # filter on the aggregated relation itself — no extra labels-vs-labels
    # join per round (one action, no second shuffle)
    adj = sym.withColumn("is_self", F.lit(False)).unionByName(
        verts.select(
            F.col("id").alias("src"), F.col("id").alias("dst")
        ).withColumn("is_self", F.lit(True))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = verts.withColumn("comp", F.col("id")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    for _round in range(max_iter):
        new_labels = (
            adj.join(labels.select(F.col("id").alias("src"), "comp"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.min("comp").alias("comp"),
                F.min(F.when(F.col("is_self"), F.col("comp"))).alias("_old"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.filter(F.col("comp") != F.col("_old")).limit(1).count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # exited via max_iter with labels still moving: the component ids
        # are WRONG (a >max_iter-hop chain splits silently) — refuse to
        # return them rather than silently diverge from keep-one semantics
        labels.unpersist()
        adj.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(labels still changing); raise max_iter — a length-k chain "
            f"needs ~k rounds"
        )
    # snapshot so the loop's last persist can be released: checkpoint
    # blocks are cleaned up with the DataFrame, a bare persist is not
    out = labels.select("id", "comp").localCheckpoint(eager=True)
    labels.unpersist()
    adj.unpersist()
    return out


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Multi-member clusters from near-dup pairs: (doc_id, component,
    cluster_size), component = min doc_id of the cluster."""
    comp = connected_components(pairs, id_a, id_b, max_iter).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        "doc_id", "component", "cluster_size"
    )


def canonicalize(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    prefer_col: str | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Attach (component, is_canonical) to ``docs``.

    Docs absent from the pair graph are their own singleton component and
    canonical. Within a cluster the canonical doc is the max of
    ``prefer_col`` (e.g. a quality score), ties and None broken by min
    ``id_col`` — so the keep-one decision is deterministic.
    """
    comp = connected_components(pairs, id_a, id_b, max_iter).select(
        F.col("id").alias(id_col), F.col("comp").alias("component")
    )
    out = docs.join(comp, id_col, "left").withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )
    order = [F.col(id_col).asc()]
    if prefer_col is not None:
        order = [F.col(prefer_col).desc_nulls_last(), F.col(id_col).asc()]
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(*order)
    return out.withColumn(
        "is_canonical", F.row_number().over(w) == 1
    )


def drop_near_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    prefer_col: str | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Keep exactly one doc per near-dup cluster (the pipeline's keep-one
    flag): ``docs`` minus every non-canonical cluster member."""
    marked = canonicalize(
        docs, pairs, id_col, id_a, id_b, prefer_col, max_iter
    )
    return marked.filter(F.col("is_canonical")).drop(
        "component", "is_canonical"
    )


def mark_near_duplicate_docs(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "scrubbed_text",
    prefer_col: str | None = None,
    shingle_n: int = 5,
    threshold: float = 0.7,
    max_iter: int = 20,
) -> DataFrame:
    """URL-keyed docs + (component, is_canonical): MinHash-LSH pairs →
    connected components → canonical per cluster.

    The dedup operators key on LONG ids; urls bridge through a dense
    surrogate-id mapping (``monotonically_increasing_id``, snapshot via
    ``localCheckpoint`` because the function is nondeterministic across
    re-evaluations). The mapping is (url, long) only — never text — and the
    clusters step itself is id-type-agnostic, so at 10^12 urls this adds
    one metadata-width shuffle each way, no collision risk (a 64-bit HASH
    surrogate would collide ~10^4 times at that scale and silently merge
    unrelated docs).
    """
    from pii_detector_spark.operators.dedup import minhash_lsh_pairs

    mapping = (
        docs.select(F.col(url_col).alias("_url"))
        .distinct()
        .withColumn("_nid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    with_ids = docs.join(
        mapping, docs[url_col] == mapping["_url"], "inner"
    ).drop("_url")
    pairs = minhash_lsh_pairs(
        with_ids.select(F.col("_nid").alias("doc_id"), text_col),
        id_col="doc_id",
        text_col=text_col,
        shingle_n=shingle_n,
        jaccard_threshold=threshold,
    )
    a = mapping.select(
        F.col("_nid").alias("id_a"), F.col("_url").alias("url_a")
    )
    b = mapping.select(
        F.col("_nid").alias("id_b"), F.col("_url").alias("url_b")
    )
    url_pairs = pairs.join(a, "id_a").join(b, "id_b").select("url_a", "url_b")
    return canonicalize(
        docs,
        url_pairs,
        id_col=url_col,
        id_a="url_a",
        id_b="url_b",
        prefer_col=prefer_col,
        max_iter=max_iter,
    )


def drop_near_duplicate_docs(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "scrubbed_text",
    prefer_col: str | None = None,
    shingle_n: int = 5,
    threshold: float = 0.7,
    max_iter: int = 20,
) -> DataFrame:
    """The pipeline-level keep-one pass: ``docs`` minus every
    non-canonical near-dup cluster member (see
    ``mark_near_duplicate_docs``)."""
    marked = mark_near_duplicate_docs(
        docs, url_col, text_col, prefer_col, shingle_n, threshold, max_iter
    )
    return marked.filter(F.col("is_canonical")).drop(
        "component", "is_canonical"
    )
