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
    fanout: int | None = None,
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

    def _sorted_cell(pdf: pd.DataFrame):
        """(ids sorted, normalized matrix in id order, sort order)."""
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        X = np.stack(pdf["vec"].map(np.asarray).to_numpy()).astype(
            np.float64
        )[order]
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0.0] = 1.0  # zero vectors: cos defined as 0, never similar
        return ids, X / n, order

    def _min_id_dropped(
        ids: "np.ndarray", Xn: "np.ndarray", tidx: "np.ndarray"
    ) -> "np.ndarray":
        """dropped flags for the target rows ``tidx`` (indices into the
        id-sorted cell): x is dropped iff some y with STRICTLY smaller id
        has cos >= tau. With duplicate ids, positional j < i is not
        enough — each row's candidate window ends at the first index of
        its own id in the sorted array (the EXISTS rule the SQL oracle
        checks). Fully vectorized: one (block × window) matmul and one
        masked any() per tile — no per-row Python loop."""
        lt = np.searchsorted(ids, ids, side="left")
        out = np.zeros(len(tidx), dtype=bool)
        for s in range(0, len(tidx), block):
            e = min(s + block, len(tidx))
            ti = tidx[s:e]
            lim = lt[ti]
            kmax = int(lim.max()) if len(lim) else 0
            if kmax == 0:
                continue
            sims = Xn[ti] @ Xn[:kmax].T  # (tile, candidate window)
            hits = (sims >= tau) & (
                np.arange(kmax)[None, :] < lim[:, None]
            )
            out[s:e] = hits.any(axis=1)
        return out

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
        ids, Xn, _ = _sorted_cell(pdf)
        dropped = np.zeros(m, dtype=bool)
        if keep == "min_id":
            dropped = _min_id_dropped(ids, Xn, np.arange(m))
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

    out_schema = f"vec_id {id_type}, cell long, dropped boolean"

    # ---- parallelism shape -------------------------------------------------
    # One task per CELL is the method's native parallelism (the paper's
    # point: k ~ corpus/cell_size cells, each task-sized). When the caller
    # asks for FEWER cells than the cluster has cores (the n_cells=1
    # verification mode, or a tiny k), a per-cell task serializes the whole
    # quadratic kernel. The min_id rule is a pure pairwise EXISTS (no
    # chaining), so it parallelizes exactly: split the TARGET rows of each
    # cell into `fanout` hash buckets, replicate the cell's candidate
    # matrix to each bucket, and compute each bucket's verdicts in its own
    # task. Replication multiplies the cell's shuffle bytes by `fanout`,
    # so it is gated to the undersubscribed case — at scale n_cells >>
    # cores and fanout stays 1 (no replication, the r5 shape unchanged).
    if fanout is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        fanout = max(1, min(32, -(-par // max(n_cells, 1))))
    if keep != "min_id":
        fanout = 1  # union-find chaining needs the whole cell in one task

    if fanout == 1:
        return assigned.groupBy("cell").applyInPandas(
            prune, schema=out_schema
        )

    def _cell_arrays(t):
        """Zero-copy extraction of (ids, vec matrix) from an Arrow group —
        the list column's flat values buffer reshapes to (m, dim) without
        the per-row ``np.asarray`` walk the pandas path pays (guide §4.2:
        hand whole Arrow buffers to numpy)."""
        import pyarrow as pa  # noqa: F401

        vec = t.column("vec").combine_chunks()
        m = len(t)
        offs = np.asarray(vec.offsets)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        if vec.null_count == 0 and np.array_equal(
            offs, np.arange(m + 1, dtype=offs.dtype) * dim + offs[0]
        ):
            X = np.asarray(vec.values)[offs[0]: offs[0] + m * dim]
            X = X.astype(np.float64, copy=False).reshape(m, dim)
        else:  # ragged/null rows: per-row fallback (never hit on clean data)
            X = np.stack(
                [np.asarray(v.as_py(), dtype=np.float64) for v in vec]
            )
        return ids, X

    def prune_bucket(t):
        import pyarrow as pa

        m = len(t)
        if m > max_cell_rows:
            raise ValueError(
                f"semantic_dedup cell has {m} rows (> max_cell_rows="
                f"{max_cell_rows}); raise n_cells so cell populations "
                "stay task-sized (pairwise pruning is quadratic per cell)"
            )
        id_field = pa.field("vec_id", t.schema.field("vec_id").type)
        if m == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], id_field.type),
                    "cell": pa.array([], pa.int64()),
                    "dropped": pa.array([], pa.bool_()),
                }
            )
        cell = t.column("cell")[0].as_py()
        tb = t.column("_tb")[0].as_py()
        own = t.column("_own_tb").to_numpy(zero_copy_only=False)
        ids, X = _cell_arrays(t)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = X[order]
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        tidx = np.nonzero(own[order] == tb)[0]
        if m < 2:
            dropped = np.zeros(len(tidx), dtype=bool)
        else:
            dropped = _min_id_dropped(ids, X / n, tidx)
        return pa.table(
            {
                "vec_id": pa.array(ids[tidx], id_field.type),
                "cell": pa.array(
                    np.full(len(tidx), cell, dtype=np.int64), pa.int64()
                ),
                "dropped": pa.array(dropped, pa.bool_()),
            }
        )

    rep = (
        assigned.withColumn(
            "_own_tb",
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(fanout)).cast("int"),
        )
        .withColumn(
            "_tb", F.explode(F.array(*[F.lit(i) for i in range(fanout)]))
        )
    )
    return rep.groupBy("cell", "_tb").applyInArrow(
        prune_bucket, schema=out_schema
    )
