"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus, rank per query. One pass over the
  corpus, no shuffle of the big side until the final per-query top-k
  (which ``WindowGroupLimit`` keeps partial). The baseline.
- ``lsh_bucketed_topk`` — random-hyperplane LSH: corpus and queries
  hash to sign-pattern buckets; candidates only where buckets match.
  Trades recall for a join that scales to corpus sizes where the
  cross product is impossible. Hyperplanes are seeded -> deterministic.

All arithmetic in double precision via JVM-side higher-order functions
(``zip_with`` + ``aggregate``) — no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import top_n_per_group
from ..operators.partitioning import ensure_min_partitions


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _dot(u: Column, v: Column) -> Column:
    return F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(_dot(v, v))


def cosine_similarity(u: Column, v: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (cast to double)."""
    du, dv = _to_double(u), _to_double(v)
    return _dot(du, dv) / (_norm(du) * _norm(dv))


def _with_norm(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    v = _to_double(F.col(vec_col))
    return df.select(F.col(id_col), v.alias("__v"), _norm(v).alias("__norm"))


def cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs: (id_a < id_b, cosine >= threshold).

    O(n²) self-join — correct baseline for modest n; at corpus scale
    use :func:`lsh_bucketed_topk`-style bucketing first. Norms are
    precomputed once per row (not per pair); the stream side is spread
    over all cores (pair compute, not the scan, dominates)."""
    e = _with_norm(ensure_min_partitions(df), vec_col, id_col)
    a, b = e.alias("a"), e.alias("b")
    sim = _dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__norm") * F.col("b.__norm"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, round_to).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact ANN baseline: per query, the k nearest corpus vectors by
    cosine (query broadcast, rank with deterministic tiebreak).

    Returns (query_id, neighbor_id, cosine)."""
    c = _with_norm(ensure_min_partitions(corpus), vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("__cv"), F.col("__norm").alias("__cn")
    )
    q = _with_norm(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__qv"), F.col("__norm").alias("__qn")
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, round_to).alias("cosine"))
    )
    return top_n_per_group(
        scored, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id").asc()], n=k
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate ANN: random-hyperplane (sign) LSH.

    Each of ``n_tables`` tables hashes a vector to an ``n_planes``-bit
    sign pattern; query/corpus pairs meet only when some table's
    pattern matches exactly. Recall grows with tables, candidate count
    shrinks with planes. Deterministic via seeded hyperplanes.
    """
    import random

    rng = random.Random(seed)
    tables = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)] for _ in range(n_tables)
    ]

    def bucket_expr(vec: Column, t: int) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(w) for w in plane]), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for plane in tables[t]
        ]
        return F.concat(F.lit(f"{t}:"), *bits)

    def with_buckets(df: DataFrame, out_id: str) -> DataFrame:
        e = _with_norm(df, vec_col, id_col)
        buckets = F.array(*[bucket_expr(F.col("__v"), t) for t in range(n_tables)])
        return e.select(
            F.col(id_col).alias(out_id), "__v", "__norm", F.explode(buckets).alias("bucket")
        )

    cb = with_buckets(ensure_min_partitions(corpus), "neighbor_id").withColumnRenamed("__v", "__cv").withColumnRenamed(
        "__norm", "__cn"
    )
    qb = with_buckets(queries, "query_id").withColumnRenamed("__v", "__qv").withColumnRenamed(
        "__norm", "__qn"
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    cands = (
        cb.join(qb, (cb.bucket == qb.bucket) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", F.round(sim, round_to).alias("cosine"))
        .distinct()
    )
    return top_n_per_group(
        cands, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id").asc()], n=k
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> probe-limited exact search
# --------------------------------------------------------------------------


def _np_normalize(mat):
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _assign_udf(centroids, n_probe: int):
    """Pandas UDF: nearest ``n_probe`` centroid ids by cosine, vectorized
    (one Arrow batch = one numpy matmul — no per-row Python)."""
    cmat = _np_normalize(np.asarray(centroids, dtype=np.float64)).T  # dim x m

    @F.pandas_udf("array<int>")
    def probe(vecs: pd.Series) -> pd.Series:
        m = _np_normalize(np.vstack(vecs.to_numpy()).astype(np.float64))
        sims = m @ cmat  # rows x m
        # stable sort: ties broken by centroid id ascending -> deterministic
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32") for row in idx])

    return probe


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int = 16,
    iters: int = 2,
) -> list[list[float]]:
    """Deterministic spherical k-means coarse quantizer.

    Init = the ``n_centroids`` corpus rows with smallest ``md5(id)``
    (a seedless uniform sample). Each Lloyd iteration assigns via the
    vectorized cosine UDF and recomputes means with DECIMAL sums
    (order-independent -> bit-stable across runs/partitionings), then
    re-normalizes. Only ``n_centroids x dim`` floats ever reach the
    driver — the model, never the data.
    """
    e = corpus.select(F.col(id_col).alias("__id"), _to_double(F.col(vec_col)).alias("__v"))
    init = (
        e.orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(n_centroids)
        .select("__v")
        .collect()
    )
    centroids = [list(r["__v"]) for r in init]
    for _ in range(max(0, iters)):
        probe = _assign_udf(centroids, 1)
        assigned = e.select(
            probe(F.col("__v"))[0].alias("__cluster"), F.posexplode(F.col("__v"))
        )
        means = (
            assigned.groupBy("__cluster", "pos")
            .agg(
                F.round(
                    F.avg(F.col("col").cast("decimal(30,12)")), 8
                ).cast("double").alias("m")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["__cluster"], {})[r.pos] = r.m
        dim = len(centroids[0])
        centroids = [
            [by_cluster[c][p] for p in range(dim)] if c in by_cluster else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    centroids: list[list[float]] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """IVF ANN: corpus vectors index into their nearest-centroid cell;
    each query probes only its ``n_probe`` nearest cells.

    The candidate join is an equi join on the cell id — candidates
    shrink ~``n_probe / n_centroids`` vs brute force while the join
    stays hash-partitionable. A corpus vector lives in exactly one
    cell, so (query, neighbor) pairs are unique — no distinct pass.
    Pass precomputed ``centroids`` to skip training (the production
    shape: train once offline, reuse per batch).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, id_col, n_centroids=n_centroids, iters=iters
        )
    c = _with_norm(ensure_min_partitions(corpus), vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__v").alias("__cv"), F.col("__norm").alias("__cn")
    )
    q = _with_norm(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__qv"), F.col("__norm").alias("__qn")
    )
    assign1 = _assign_udf(centroids, 1)
    probe_n = _assign_udf(centroids, n_probe)
    c = c.withColumn("__cell", assign1(F.col("__cv"))[0])
    q = q.withColumn("__cell", F.explode(probe_n(F.col("__qv"))))
    sim = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    cands = c.join(q, (c.__cell == q.__cell) & (F.col("query_id") != F.col("neighbor_id"))).select(
        "query_id", "neighbor_id", F.round(sim, round_to).alias("cosine")
    )
    return top_n_per_group(
        cands, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id").asc()], n=k
    )
