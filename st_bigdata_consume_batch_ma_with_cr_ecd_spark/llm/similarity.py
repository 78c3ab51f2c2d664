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
