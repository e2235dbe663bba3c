"""Semantic deduplication (SemDeDup-style): cluster embeddings, prune
within-cluster cosine near-duplicates.

The public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication") prunes a corpus by
(1) k-means-clustering document embeddings and (2) dropping, within each
cluster, all but one member of every cosine-similarity ``>= tau`` group.
Pairwise similarity is only ever computed *inside* a cluster, which is
what makes the method tractable at web scale: O(sum c_i^2) with cell
populations c_i ~ n/k, never O(n^2).

This implementation composes the engine's existing deterministic IVF
machinery (``similarity.ivf_train_centroids`` — md5-seeded, fixed-point
Lloyd steps, identical centroids on every run/partitioning — and
``similarity.ivf_assign`` for frozen-centroid delta assignment) with one
new per-cell pruning kernel:

* **keep rule**: within a cell, drop ``x`` iff some ``y`` with
  ``vec_id < x`` has ``cos(x, y) >= tau``.  This is the deterministic
  id-dominance variant of the paper's rule (the paper keeps the member
  with the lowest centroid similarity; any single-survivor rule yields
  the same dedup *rate*, and id-dominance is engine-portable — a DuckDB
  ``EXISTS`` oracle can verify the exact drop set row for row).
  Transitive chains collapse to the least id: y~x and x~z drops both
  toward min-id even when cos(y, z) < tau — matching the paper's
  "keep one representative per similarity group" intent.
* **shape**: one cell-keyed shuffle, then per-cell blocked numpy matmul
  inside ``applyInPandas`` — each vector crosses the Arrow boundary
  once; pair rows never materialize (only the boolean verdict per row
  comes back).  Per-task memory is cell_size x dim plus a
  block x cell_size tile.
* **scale guard**: a skewed/giant cell turns the kernel quadratic, so
  ``max_cell_rows`` FAILS LOUDLY (with the n_cells remedy in the
  message) instead of silently burning a task for hours — same
  explicit-failure discipline as ``clusters.connected_components``.

The reference engine has no embedding operators (SURVEY.md §2.6 —
beyond-reference training-data toolkit); the nearest reference analogue
is the duplicate-suppression intent of its already-scanned set
(``app/services/base_scan_service.py:118-141``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_detector_spark.operators.similarity import (
    ivf_assign,
    ivf_train_centroids,
)


def semantic_dedup(
    df: DataFrame,
    dim: int,
    tau: float = 0.95,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
    block: int = 2048,
    max_cell_rows: int = 2_000_000,
    keep: str = "min_id",
) -> DataFrame:
    """Per-document semantic-dup verdicts: (vec_id, cell, dropped).

    ``centroids=None`` trains them here (small-corpus / first-build
    path); passing a stored matrix is the delta path — new documents are
    assigned under frozen centroids and pruned against whatever corpus
    ``df`` holds, without re-clustering (same artifact contract as
    ``ivf_query``).  Filter ``~dropped`` to materialize the pruned
    corpus; the verdict form keeps both sides auditable.

    ``keep`` picks the survivor rule:

    * ``"min_id"`` (default) — drop x iff some y with id<x has
      cos>=tau.  Engine-portable (a SQL EXISTS verifies the exact drop
      set) and single-pass.
    * ``"low_centroid_sim"`` — the paper's rule: union duplicate pairs
      into groups and keep, per group, the member LEAST similar to its
      cell centroid (ties → smallest id).  Keeps the ε-ball outskirts,
      which the paper found preserves diversity best.
    """
    if keep not in ("min_id", "low_centroid_sim"):
        raise ValueError(f"unknown keep rule: {keep!r}")
    id_type = df.schema[id_col].dataType.simpleString()
    c = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    if centroids is None:
        # ivf_train_centroids keys its deterministic seeding on a LONG id;
        # a surrogate md5-derived long keeps training id-type-agnostic
        # (string/url-keyed corpora) while staying fully deterministic
        train_in = c.select(
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("vec_id"),
            "vec",
        )
        centroids = ivf_train_centroids(
            train_in, dim=dim, n_cells=n_cells, iters=iters,
            id_col="vec_id", vec_col="vec",
        )
    assigned = ivf_assign(c, centroids)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_cell_rows:
            raise ValueError(
                f"semantic_dedup cell has {m} rows (> max_cell_rows="
                f"{max_cell_rows}); raise n_cells so cell populations "
                "stay task-sized (pairwise pruning is quadratic per cell)"
            )
        cell = int(pdf["cell"].iloc[0]) if m else 0
        if m < 2:
            return pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": np.full(m, cell, dtype=np.int64),
                    "dropped": np.zeros(m, dtype=bool),
                }
            )
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        X = np.stack(pdf["vec"].map(np.asarray).to_numpy()).astype(
            np.float64
        )[order]
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0.0] = 1.0  # zero vectors: cos defined as 0, never similar
        Xn = X / n
        dropped = np.zeros(m, dtype=bool)
        if keep == "min_id":
            # dominators must have STRICTLY smaller ids (the EXISTS rule
            # the SQL oracle checks): with duplicate ids, positional
            # j < i is not enough — limit each row to the first index of
            # its own id in the sorted array.
            lt = np.searchsorted(ids, ids, side="left")
            for s in range(0, m, block):
                e = min(s + block, m)
                sims = Xn[s:e] @ Xn.T  # (block, m) tile
                for r in range(e - s):
                    gi = s + r
                    lim = int(lt[gi])
                    if lim == 0:
                        continue
                    if np.any(sims[r, :lim] >= tau):
                        dropped[gi] = True
        else:  # "low_centroid_sim": group duplicates, keep the outskirt
            parent = np.arange(m)

            def find(i: int) -> int:
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for s in range(0, m, block):
                e = min(s + block, m)
                sims = Xn[s:e] @ Xn.T
                for r in range(e - s):
                    gi = s + r
                    js = np.nonzero(sims[r, gi + 1 :] >= tau)[0] + gi + 1
                    for j in js:
                        ri, rj = find(gi), find(int(j))
                        if ri != rj:
                            parent[max(ri, rj)] = min(ri, rj)
            cvec = np.asarray(centroids[cell], dtype=np.float64)
            cn = np.linalg.norm(cvec)
            csim = Xn @ (cvec / cn if cn > 0.0 else cvec)
            groups: dict[int, list[int]] = {}
            for i in range(m):
                groups.setdefault(find(i), []).append(i)
            for members in groups.values():
                if len(members) < 2:
                    continue
                keeper = min(members, key=lambda i: (csim[i], ids[i]))
                for i in members:
                    if i != keeper:
                        dropped[i] = True
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": np.full(m, cell, dtype=np.int64),
                "dropped": dropped,
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        prune, schema=f"vec_id {id_type}, cell long, dropped boolean"
    )
