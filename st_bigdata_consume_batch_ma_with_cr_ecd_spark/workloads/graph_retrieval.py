"""Graph analytics, ranked retrieval, and Arrow-native batteries.

Fills three capability corners a 100-TB corpus platform needs beyond
the dedup/similarity families already registered in ``workloads/llm.py``:

- **Ranked retrieval** (``retrieval_bm25_topk``): the sparse half of a
  retrieval stack — BM25 over the corpus inverted index, scored only
  for documents containing a query term (the classic impact-ordered
  sparsity win; never a corpus-wide cross join).
- **Iterative graph rank** (``graph_pagerank_fixed``): PageRank with a
  fixed iteration budget — the influence/authority scoring pattern for
  link graphs, run as one shuffle per iteration with decimal-exact
  mass accounting so every engine lands on identical ranks.
- **Arrow-native UDF surface** (``embedding_normalize_arrow``,
  ``embedding_label_minmax_arrow``): PySpark 4's ``mapInArrow`` /
  ``applyInArrow`` — zero pandas conversion overhead, numpy directly
  on the Arrow buffers. The rounding contract stays JVM-side (the UDF
  emits raw doubles; Spark rounds) so the DuckDB oracles replay
  bit-for-bit.
- **Directed containment dedup** (``dedup_ngram_containment``): the
  subset-detection twin of Jaccard near-dedup (quote extraction,
  boilerplate-wrapped mirrors) on the same bucketed pair machinery.
- **Smoothed time series** (``stats_ewma_daily``): exponentially
  weighted daily metrics via an order-fixed fold — the trend baseline
  for the ingest-volume monitors.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.dedup import ngram_containment_pairs
from ..llm.text import tokenize
from ..operators.dedup import top_n_per_group
from ..sources.readers import read_testdata
from .llm import _DUCK_SHINGLES, _DUCK_TOKENS
from .registry import register

# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

# Literal query set: terms drawn from the synthetic corpus vocabulary.
# In production this table arrives as a (query_id, token) side input —
# always tiny relative to the corpus, hence the broadcast below.
_BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("q_spark_join", ["spark", "join"]),
    ("q_batch_window", ["window", "merge", "batch"]),
    ("q_vector_scan", ["vector", "scan"]),
]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5


def _bm25_scored_sql() -> str:
    """The shared WITH-body producing ``scored(query_id, doc_id, score)``
    — consumed by the BM25 top-k oracle AND the hybrid-RRF oracle so the
    two replay the identical determinism contract (round-8 per-term,
    exact DECIMAL sum, round-4 total)."""
    q_values = ", ".join(
        f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    # Expression shapes mirror the Spark side token for token: the
    # scalar double chain (ln, +, *, /) is IEEE-identical cross-engine;
    # per-term scores round at 8 then sum exactly as DECIMAL so the
    # per-document total is independent of term order.
    return f"""
    queries(query_id, token) AS (SELECT * FROM (VALUES {q_values})),
    tok AS (
        SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM t2 GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    tot AS (SELECT sum(dl) AS total_len FROM dl),
    term_scores AS (
        SELECT q.query_id, tf.doc_id,
               ln((nd.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / (tot.total_len / nd.n_docs))) AS s
        FROM tf
        JOIN queries q ON tf.token = q.token
        JOIN dfreq ON tf.token = dfreq.token
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN nd CROSS JOIN tot
    ),
    scored AS (
        SELECT query_id, doc_id,
               CAST(round(sum(CAST(round(s, 8) AS DECIMAL(30,8))), 4) AS DOUBLE) AS score
        FROM term_scores GROUP BY 1, 2
    )"""


def _bm25_oracle() -> str:
    return f"""
    WITH {_bm25_scored_sql()}
    SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id ASC
        ) AS rank
        FROM scored
    ) WHERE rank <= {_BM25_TOPK}
    """


@register(
    "retrieval_bm25_topk",
    oracle=_bm25_oracle(),
    doc="BM25 (k1=1.2, b=0.75) top-5 documents per query over the corpus "
    "inverted index. One token explode feeds tf, doclen, AND df (three "
    "hash aggregates over the same scan); corpus stats join in as 1-row "
    "broadcasts; the query table broadcasts onto the tf rows so only "
    "documents containing a query term are ever scored — scoring cost "
    "tracks posting-list length, not corpus size. Per-term scores round "
    "at 8 and sum as exact DECIMAL (term-order independent); top-k per "
    "query is a WindowGroupLimit with a (score DESC, doc_id) total "
    "order.",
    tags=("bench",),
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scores(spark, sf_dir)
    return top_n_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        n=_BM25_TOPK,
        rank_col="rank",
        keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


def _bm25_scores(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """BM25 scores (query_id, doc_id, score) for every document holding
    at least one query term — the pre-top-k table both the ranked
    retrieval query and the hybrid RRF fusion consume. ``docs``
    overrides the corpus (scale probes inject amplified replicas)."""
    if docs is None:
        docs = read_testdata(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id string, token string",
    )
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token")).where(
        F.col("token") != ""
    )
    # tf fans out to THREE consumers (dl, dfreq, scoring); checkpoint it
    # so the tokenize/explode/aggregate subtree runs once (the
    # ngram_jaccard_pairs lesson — Catalyst does not reuse the subtree)
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # lazy: plan inspection stays job-free
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).localCheckpoint(eager=False)
    # document frequency is only ever consumed for query terms, so the
    # broadcast query filter pushes BELOW the aggregate: df values for
    # the filtered tokens are identical to corpus-wide df
    tf_q = tf.join(F.broadcast(queries.select("token").distinct()), "token")
    dfreq = tf_q.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tot = dl.agg(F.sum("dl").alias("total_len"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    s = (
        idf
        * (F.col("tf") * F.lit(_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl)
        )
    )
    term_scores = (
        tf_q.join(F.broadcast(queries), "token")
        .join(dfreq, "token")
        # merge pin: dl is DOC-sized behind a checkpoint whose bare scan
        # AQE can never measure — unpinned, Catalyst statically
        # broadcasts it off the inherited estimate (caught by the r6
        # checkpoint-broadcast sweep; SCALE.md round 6)
        .join(dl.hint("merge"), "doc_id")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(tot))
        .select("query_id", "doc_id", s.alias("s"))
    )
    return term_scores.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(F.round(F.col("s"), 8).cast("decimal(30,8)")), 4)
        .cast("double")
        .alias("score")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ∪ dense ANN, fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

# Each hybrid query carries BOTH representations: the BM25 token list
# (shared with _BM25_QUERIES) and a dense anchor — the embedding of a
# designated corpus vector standing in for the encoded query text (the
# fixture has no text encoder; in production this column arrives from
# the same model that embedded the corpus). doc_id and vec_id share the
# 0..N-1 key space by fixture construction (TESTDATA.md).
_RRF_ANCHORS: list[tuple[str, int]] = [
    ("q_spark_join", 0),
    ("q_batch_window", 1),
    ("q_vector_scan", 2),
]
_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
_RRF_POOL = 20  # per-system candidate pool depth
_RRF_TOPK = 5


def _rrf_oracle() -> str:
    a_values = ", ".join(f"('{qid}', {vid})" for qid, vid in _RRF_ANCHORS)
    return f"""
    WITH {_bm25_scored_sql()},
    anchors(query_id, avid) AS (SELECT * FROM (VALUES {a_values})),
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    dense_scored AS (
        SELECT a.query_id, c.vec_id AS doc_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM anchors a
        JOIN e q ON q.vec_id = a.avid
        JOIN e c ON c.vec_id <> q.vec_id
    ),
    dense_ranked AS (
        SELECT query_id, doc_id, rank_d FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS rank_d
            FROM dense_scored
        ) WHERE rank_d <= {_RRF_POOL}
    ),
    sparse_ranked AS (
        SELECT query_id, doc_id, rank_s FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank_s
            FROM scored
        ) WHERE rank_s <= {_RRF_POOL}
    ),
    fused AS (
        SELECT coalesce(s.query_id, d.query_id) AS query_id,
               coalesce(s.doc_id, d.doc_id) AS doc_id,
               round(coalesce(1.0 / ({_RRF_K} + s.rank_s), 0)
                     + coalesce(1.0 / ({_RRF_K} + d.rank_d), 0), 6) AS rrf_score,
               -- rank 0 = "not surfaced by this system": keeps the
               -- columns NON-NULL int (a nullable INT degrades to
               -- float64 through every pandas fetch path — dtype audit)
               CAST(coalesce(s.rank_s, 0) AS INT) AS sparse_rank,
               CAST(coalesce(d.rank_d, 0) AS INT) AS dense_rank
        FROM sparse_ranked s
        FULL OUTER JOIN dense_ranked d
          ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rn AS INT) AS fused_rank,
           sparse_rank, dense_rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS rn
        FROM fused
    ) WHERE rn <= {_RRF_TOPK}
    """


@register(
    "retrieval_hybrid_rrf",
    oracle=_rrf_oracle(),
    doc="Hybrid retrieval: the BM25 sparse ranking and an exact-cosine "
    "dense ranking each contribute a top-20 candidate pool per query, "
    "fused by reciprocal-rank fusion (1/(60+rank), Cormack et al. 2009) "
    "into a top-5. RRF consumes RANKS only, so fusion inherits both "
    "systems' determinism contracts (BM25's round-8/DECIMAL/round-4 "
    "chain; cosine's round-6) and needs no score calibration between "
    "incommensurable scales. Scale shape: each system's cost is its own "
    "(both already pool-bounded — posting-list-sparse BM25, broadcast-"
    "query dense scan); fusion itself is a full outer join of two "
    "POOL-sized tables per query — never corpus-sized. The dense anchor "
    "is a designated corpus embedding per query (no text encoder in the "
    "fixture); sparse_rank/dense_rank stay in the output (0 = not in "
    "that system's pool) so downstream rerankers can see which system "
    "surfaced each hit.",
)
def retrieval_hybrid_rrf(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    embs: DataFrame | None = None,
) -> DataFrame:
    from ..llm.similarity import brute_force_topk

    anchors = spark.createDataFrame(_RRF_ANCHORS, "query_id string, avid bigint")
    if embs is None:
        embs = read_testdata(spark, sf_dir, "embeddings")
    dense_pool = brute_force_topk(
        embs, embs.where(F.col("vec_id").isin([v for _, v in _RRF_ANCHORS])), k=_RRF_POOL
    )
    # brute_force_topk's query_id is the anchor VEC id: re-rank the
    # pool (row_number over the same total order — identical ranks on
    # the top-k subset) and map to the query name via the tiny anchor
    # table. Rename neighbor_id -> doc_id: the fixture's vec/doc key
    # spaces coincide.
    dense_ranked = (
        top_n_per_group(
            dense_pool.withColumnRenamed("query_id", "avid"),
            ["avid"],
            [F.col("cosine").desc(), F.col("neighbor_id").asc()],
            n=_RRF_POOL,
            rank_col="rank_d",
            keep_rank=True,
        )
        .join(F.broadcast(anchors), "avid")
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank_d")
    )
    sparse_ranked = top_n_per_group(
        _bm25_scores(spark, sf_dir, docs=docs),
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        n=_RRF_POOL,
        rank_col="rank_s",
        keep_rank=True,
    ).select("query_id", "doc_id", "rank_s")
    return rrf_fuse(sparse_ranked, dense_ranked, k=_RRF_TOPK, rrf_k=_RRF_K)


def rrf_fuse(
    sparse_ranked: DataFrame,
    dense_ranked: DataFrame,
    *,
    k: int = _RRF_TOPK,
    rrf_k: int = _RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings
    ``(query_id, doc_id, rank_s)`` and ``(query_id, doc_id, rank_d)``:
    rrf = sum over present systems of 1/(rrf_k + rank), round-6; top-k
    per query under (score DESC, doc_id ASC). Pool-bounded full outer
    join — never corpus-sized. Rank 0 in the output = "not surfaced by
    this system" (non-null int by construction; a nullable INT degrades
    to float64 through every pandas fetch path — dtype audit)."""
    fused = sparse_ranked.join(dense_ranked, ["query_id", "doc_id"], "full_outer")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_s")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_d")), F.lit(0.0)),
        6,
    )
    scored = fused.select(
        "query_id",
        "doc_id",
        rrf.alias("rrf_score"),
        F.coalesce(F.col("rank_s"), F.lit(0)).cast("int").alias("sparse_rank"),
        F.coalesce(F.col("rank_d"), F.lit(0)).cast("int").alias("dense_rank"),
    )
    return (
        top_n_per_group(
            scored,
            ["query_id"],
            [F.col("rrf_score").desc(), F.col("doc_id").asc()],
            n=k,
            rank_col="fused_rank",
            keep_rank=True,
        )
        .withColumn("fused_rank", F.col("fused_rank").cast("int"))
        .select("query_id", "doc_id", "rrf_score", "fused_rank", "sparse_rank", "dense_rank")
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation: nDCG@5 across the three rankers
# ---------------------------------------------------------------------------

import math as _m

_NDCG_K = 5
# Discount weights 1/log2(pos+1) computed ONCE in Python and embedded
# as the same 8-decimal literals in both engines — log2 differs in the
# last ulp between JVM and C runtimes, so the discounts must never be
# recomputed engine-side.
_NDCG_DISC: list[tuple[int, float]] = [
    (i, round(1.0 / _m.log2(i + 1), 8)) for i in range(1, _NDCG_K + 1)
]


def _ndcg_oracle() -> str:
    a_values = ", ".join(f"('{qid}', {vid})" for qid, vid in _RRF_ANCHORS)
    d_values = ", ".join(f"({p}, CAST({d!r} AS DOUBLE))" for p, d in _NDCG_DISC)
    return f"""
    WITH b AS ({_bm25_oracle()}),
    h AS ({_rrf_oracle()}),
    anchors(query_id, avid) AS (SELECT * FROM (VALUES {a_values})),
    disc(pos, disc) AS (SELECT * FROM (VALUES {d_values})),
    e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    dense_scored AS (
        SELECT a.query_id, c.vec_id AS doc_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM anchors a
        JOIN e q ON q.vec_id = a.avid
        JOIN e c ON c.vec_id <> q.vec_id
    ),
    retrieved AS (
        SELECT query_id, doc_id, rank AS pos, 'bm25' AS system FROM b
        UNION ALL
        SELECT query_id, doc_id, fused_rank AS pos, 'hybrid' AS system FROM h
        UNION ALL
        SELECT query_id, doc_id, rn AS pos, 'dense' AS system FROM (
            SELECT query_id, doc_id, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS rn
            FROM dense_scored
        ) WHERE rn <= {_NDCG_K}
    ),
    qlabel AS (
        SELECT a.query_id, a.avid, e.label AS anchor_label
        FROM anchors a JOIN e ON e.vec_id = a.avid
    ),
    nrel AS (
        SELECT q.query_id, count(*) AS r
        FROM qlabel q JOIN e ON e.label = q.anchor_label
                              AND e.vec_id <> q.avid
        GROUP BY 1
    ),
    dcg AS (
        SELECT r.query_id, r.system,
               sum(CAST(round(
                   (CASE WHEN e.label = q.anchor_label
                         AND e.vec_id <> q.avid THEN 1 ELSE 0 END) * d.disc,
               8) AS DECIMAL(20,8))) AS dcg
        FROM retrieved r
        JOIN e ON e.vec_id = r.doc_id
        JOIN qlabel q ON q.query_id = r.query_id
        JOIN disc d ON d.pos = r.pos
        GROUP BY 1, 2
    ),
    idcg AS (
        SELECT n.query_id,
               sum(CAST(round(d.disc, 8) AS DECIMAL(20,8))) AS idcg
        FROM nrel n JOIN disc d ON d.pos <= least(n.r, {_NDCG_K})
        GROUP BY 1
    )
    SELECT dcg.query_id, dcg.system,
           round(CAST(dcg.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6) AS ndcg
    FROM dcg JOIN idcg i ON i.query_id = dcg.query_id
    """


@register(
    "eval_retrieval_ndcg",
    oracle=_ndcg_oracle(),
    doc="nDCG@5 for each of the three rankers (bm25 / dense / hybrid "
    "RRF) per query: binary relevance = corpus label matches the "
    "query anchor's label; the anchor document ITSELF is non-relevant "
    "and excluded from the relevant count (r10 ADVICE: the dense "
    "ranker self-excludes the anchor while bm25/hybrid can retrieve "
    "its doc_id — counting it was a cross-system bias whenever a "
    "label class has <= k+1 members); iDCG from the GLOBAL relevant "
    "count (min k), so systems are compared against the same ideal. "
    "Discount "
    "weights 1/log2(pos+1) are Python-computed 8-decimal literals on "
    "BOTH engines (JVM and C log2 differ in the last ulp); DCG sums "
    "them as exact DECIMAL. Scale shape: the eval joins only the "
    "k-sized retrieved lists against the label table — the heavy "
    "lifting is the rankers themselves, each already pool-bounded.",
)
def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import brute_force_topk

    anchors = spark.createDataFrame(_RRF_ANCHORS, "query_id string, avid bigint")
    disc = spark.createDataFrame(_NDCG_DISC, "pos int, disc double")
    embs = read_testdata(spark, sf_dir, "embeddings")

    sparse = top_n_per_group(
        _bm25_scores(spark, sf_dir),
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        n=_NDCG_K,
        rank_col="pos",
        keep_rank=True,
    ).select("query_id", "doc_id", "pos", F.lit("bm25").alias("system"))
    dense = (
        top_n_per_group(
            brute_force_topk(
                embs,
                embs.where(F.col("vec_id").isin([v for _, v in _RRF_ANCHORS])),
                k=_NDCG_K,
            ).withColumnRenamed("query_id", "avid"),
            ["avid"],
            [F.col("cosine").desc(), F.col("neighbor_id").asc()],
            n=_NDCG_K,
            rank_col="pos",
            keep_rank=True,
        )
        .join(F.broadcast(anchors), "avid")
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            "pos",
            F.lit("dense").alias("system"),
        )
    )
    hybrid = retrieval_hybrid_rrf(spark, sf_dir).select(
        "query_id",
        "doc_id",
        F.col("fused_rank").alias("pos"),
        F.lit("hybrid").alias("system"),
    )
    retrieved = sparse.unionByName(dense).unionByName(hybrid)

    # labels is CORPUS-sized: the k-sized retrieved lists are the
    # broadcast side, never the label table
    labels = embs.select(F.col("vec_id").alias("doc_id"), "label")
    qlabel = embs.join(
        F.broadcast(anchors), F.col("vec_id") == F.col("avid")
    ).select("query_id", "avid", F.col("label").alias("anchor_label"))
    # the anchor itself never counts as relevant (r10 ADVICE): exclude
    # it from the relevant-population count AND the judgment below
    nrel = embs.select("vec_id", "label").join(
        F.broadcast(qlabel),
        (F.col("label") == F.col("anchor_label")) & (F.col("vec_id") != F.col("avid")),
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("r"))

    rel = (
        (F.col("label") == F.col("anchor_label")) & (F.col("doc_id") != F.col("avid"))
    ).cast("int")
    dcg = (
        labels.join(F.broadcast(retrieved), "doc_id")
        .join(F.broadcast(qlabel), "query_id")
        .join(F.broadcast(disc), "pos")
        .groupBy("query_id", "system")
        .agg(
            F.sum(F.round(rel * F.col("disc"), 8).cast("decimal(20,8)")).alias("dcg")
        )
    )
    idcg = (
        nrel.join(F.broadcast(disc), F.col("pos") <= F.least(F.col("r"), F.lit(_NDCG_K)))
        .groupBy("query_id")
        .agg(F.sum(F.round(F.col("disc"), 8).cast("decimal(20,8)")).alias("idcg"))
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        "system",
        F.round(
            F.col("dcg").cast("double") / F.col("idcg").cast("double"), 6
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# PageRank, fixed iteration budget
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_DAMPING = 0.85
# Supplier nodes share the BIGINT key space with customers; offset them
# into a disjoint range. At real scale use a struct/typed node id.
_PR_SUPP_OFFSET = 1_000_000_000
_PR_DEC = "decimal(26,12)"


def _pagerank_oracle() -> str:
    base = f"""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {_PR_SUPP_OFFSET} AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    it0 AS (
        SELECT node, CAST(round(1.0 / nn.n, 12) AS {_PR_DEC}) AS rank
        FROM nodes CROSS JOIN nn
    )"""
    steps = []
    for k in range(1, _PR_ITERS + 1):
        p = k - 1
        steps.append(f"""
    m{k} AS (
        SELECT e.dst AS node,
               sum(CAST(round(CAST(r.rank AS DOUBLE) / o.outdeg, 12) AS {_PR_DEC})) AS in_mass
        FROM it{p} r JOIN edges e ON r.node = e.src JOIN outdeg o ON r.node = o.src
        GROUP BY e.dst
    ),
    d{k} AS (
        SELECT coalesce(sum(r.rank), 0) AS dm
        FROM it{p} r LEFT JOIN outdeg o ON r.node = o.src
        WHERE o.outdeg IS NULL
    ),
    it{k} AS (
        SELECT n.node,
               CAST(round({1 - _PR_DAMPING} / nn.n + {_PR_DAMPING} *
                    (coalesce(CAST(m.in_mass AS DOUBLE), 0.0)
                     + CAST(d.dm AS DOUBLE) / nn.n), 12) AS {_PR_DEC}) AS rank
        FROM nodes n
        LEFT JOIN m{k} m ON n.node = m.node
        CROSS JOIN d{k} d CROSS JOIN nn
    )""")
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
    SELECT node, CAST(rank AS DOUBLE) AS rank FROM it{_PR_ITERS}
    """
    )


@register(
    "graph_pagerank_fixed",
    oracle=_pagerank_oracle(),
    doc="PageRank (5 iterations, d=0.85) over the customer->supplier "
    "purchase graph (distinct (o_custkey, l_suppkey) edges via the "
    "orders-lineitem join). Each iteration is ONE shuffle on the edge "
    "destination: contributions are generated from the cached edge "
    "list joined to the current rank vector, dangling mass folds in as "
    "a 1-row broadcast, and the rank vector localCheckpoints per round "
    "(operators/graph.py pattern) so lineage stays flat. Mass "
    "accounting is decimal-exact (per-edge contributions round at 12 "
    "then sum as DECIMAL(26,12)), so ranks are bit-identical on any "
    "partitioning and any engine — the oracle unrolls the same 5 "
    "iterations as plain CTEs. Only the node COUNT ever reaches the "
    "driver (model, not data).",
    tags=("bench",),
)
def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    lineitem = read_testdata(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(_PR_SUPP_OFFSET)).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # nodes carry a has_out flag from birth: the per-iteration dangling
    # mass is then a FILTERED 1-row aggregate over the rank vector
    # itself instead of a ranks-x-outdeg left join — two exchanges and
    # a sort per iteration removed, identical decimal arithmetic
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            outdeg.select(F.col("src").alias("node"), F.lit(True).alias("has_out")),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("has_out"), F.lit(False)).alias("has_out"))
        .localCheckpoint(eager=True)
    )
    # (src, dst, outdeg), joined against the rank vector EVERY
    # iteration — cached PARTITIONED AND SORTED on the join key (r14,
    # §2.4): an RDD checkpoint has unknown partitioning, so r13's
    # shape re-exchanged and re-sorted the full edge list in each of
    # the 5 contribution joins. A cache, unlike a checkpoint, REPORTS
    # its child plan's partitioning and ordering (InMemoryRelation
    # forwards outputPartitioning/outputOrdering), so the join sees
    # HashPartitioning(src) + sorted-by-src and per iteration only the
    # node-count-sized rank vector moves. A bucketed staging TABLE was
    # built and measured first (plans/r14/pagerank_iteration_join_*):
    # same plan shape, but the per-iteration parquet re-scan + catalog
    # overhead cost MORE than the removed exchange at sf0.1 (bench
    # 8.5 s vs 5.6 s) — the cache keeps the layout win without the
    # I/O. The rank-vector broadcast alternative stays rejected —
    # corpus-sized at 100 TB; the merge pin keeps the estimate-driven
    # broadcast of the (equally corpus-sized) edge list out too.
    from ..operators.partitioning import session_width

    edges_out = (
        edges.join(outdeg, "src")
        .repartition(session_width(edges), "src")
        .sortWithinPartitions("src")
        .cache()
    )
    n = nodes.count()  # scalar model value, O(1) to the driver

    ranks = nodes.withColumn(
        "rank", F.round(F.lit(1.0) / F.lit(n), 12).cast(_PR_DEC)
    ).localCheckpoint(eager=True)

    for _ in range(_PR_ITERS):
        # merge pin on the contribution join: the edge table is
        # CORPUS-sized, so an estimate-driven broadcast is the r5
        # hazard class at 100 TB — and at sf0.1 it is also simply
        # slower (the parquet estimate is small enough to broadcast,
        # so every iteration re-scanned + re-built the hash relation:
        # bench 8.5 s vs 6.1 s pinned). Under the pin the bucketed
        # scan IS the join layout: edge side no exchange, no sort —
        # only the node-sized rank vector moves per iteration.
        contrib = edges_out.hint("merge").join(
            ranks, edges_out["src"] == ranks["node"]
        ).select(
            F.col("dst"),
            F.round(F.col("rank").cast("double") / F.col("outdeg"), 12)
            .cast(_PR_DEC)
            .alias("c"),
        )
        in_mass = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("c").alias("in_mass")
        )
        dangling = (
            ranks.where(~F.col("has_out"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dm"))
        )
        new_rank = F.round(
            F.lit(1 - _PR_DAMPING) / F.lit(n)
            + F.lit(_PR_DAMPING)
            * (
                F.coalesce(F.col("in_mass").cast("double"), F.lit(0.0))
                + F.col("dm").cast("double") / F.lit(n)
            ),
            12,
        ).cast(_PR_DEC)
        ranks = (
            ranks.select("node", "has_out")
            .join(in_mass, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", "has_out", new_rank.alias("rank"))
            .localCheckpoint(eager=True)
        )

    return ranks.select("node", F.col("rank").cast("double").alias("rank"))


_HITS_ITERS = 3
_HITS_DEC = "decimal(38,12)"


def _hits_oracle() -> str:
    sq = "CAST(round(CAST({col} AS DOUBLE) * CAST({col} AS DOUBLE), 12) AS DECIMAL(38,12))"
    steps = []
    prev_a = "a0"
    for i in range(1, _HITS_ITERS + 1):
        steps.append(f"""
    hraw{i} AS (
        SELECT e.src AS node, CAST(sum(a.score) AS DECIMAL(38,12)) AS raw
        FROM edges e JOIN {prev_a} a ON e.dst = a.node GROUP BY e.src
    ),
    hn{i} AS (SELECT sqrt(CAST(sum({sq.format(col='raw')}) AS DOUBLE)) AS nrm FROM hraw{i}),
    h{i} AS (
        SELECT node, CAST(round(CAST(raw AS DOUBLE) / nrm, 12) AS {_HITS_DEC}) AS score
        FROM hraw{i} CROSS JOIN hn{i}
    ),
    araw{i} AS (
        SELECT e.dst AS node, CAST(sum(h.score) AS DECIMAL(38,12)) AS raw
        FROM edges e JOIN h{i} h ON e.src = h.node GROUP BY e.dst
    ),
    an{i} AS (SELECT sqrt(CAST(sum({sq.format(col='raw')}) AS DOUBLE)) AS nrm FROM araw{i}),
    a{i} AS (
        SELECT node, CAST(round(CAST(raw AS DOUBLE) / nrm, 12) AS {_HITS_DEC}) AS score
        FROM araw{i} CROSS JOIN an{i}
    )""")
        prev_a = f"a{i}"
    return f"""
    WITH edges AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {_PR_SUPP_OFFSET} AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    a0 AS (SELECT DISTINCT dst AS node, CAST(1 AS {_HITS_DEC}) AS score FROM edges),
    {",".join(steps)}
    SELECT 'hub' AS role, node, CAST(score AS DOUBLE) AS score FROM h{_HITS_ITERS}
    UNION ALL
    SELECT 'authority', node, CAST(score AS DOUBLE) FROM a{_HITS_ITERS}
    """


@register(
    "graph_hits_fixed",
    oracle=_hits_oracle(),
    doc="HITS hubs & authorities (3 iterations, L2-normalized) over the "
    "customer->supplier purchase graph — on a bipartite graph hubs "
    "score the buyers and authorities the suppliers, the natural "
    "influence split PageRank's single score conflates. Same "
    "decimal-exact iterative template as graph_pagerank_fixed: each "
    "half-step is one shuffle (join the score vector to the cached "
    "edge list, decimal-sum per endpoint), the L2 norm is a 1-row "
    "broadcast (squares rounded at 12 into exact DECIMAL sums, one "
    "deterministic sqrt), scores re-round at 12 per half-step so every "
    "engine and every partitioning lands on identical numbers.",
)
def graph_hits_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    lineitem = read_testdata(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(_PR_SUPP_OFFSET)).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def normalized(raw: DataFrame) -> DataFrame:
        sq = F.round(
            F.col("raw").cast("double") * F.col("raw").cast("double"), 12
        ).cast("decimal(38,12)")
        nrm = raw.agg(F.sqrt(F.sum(sq).cast("double")).alias("nrm"))
        return (
            raw.crossJoin(F.broadcast(nrm))
            .select(
                "node",
                F.round(F.col("raw").cast("double") / F.col("nrm"), 12)
                .cast(_HITS_DEC)
                .alias("score"),
            )
            .localCheckpoint(eager=True)
        )

    auth = edges.select(F.col("dst").alias("node")).distinct().withColumn(
        "score", F.lit(1).cast(_HITS_DEC)
    )
    hubs = None
    for _ in range(_HITS_ITERS):
        hraw = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("score").cast("decimal(38,12)").alias("raw"))
        )
        hubs = normalized(hraw)
        araw = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("score").cast("decimal(38,12)").alias("raw"))
        )
        auth = normalized(araw)

    return (
        hubs.select(F.lit("hub").alias("role"), "node", F.col("score").cast("double").alias("score"))
        .unionByName(
            auth.select(
                F.lit("authority").alias("role"), "node", F.col("score").cast("double").alias("score")
            )
        )
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ),
    t AS (
        SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.v = e2.u
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    n AS (
        SELECT count(DISTINCT x) AS n_nodes
        FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
    ),
    m AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM n CROSS JOIN m CROSS JOIN t
    """,
    doc="Distributed triangle counting over the part co-purchase graph "
    "(parts sharing an order are connected). Two scale patterns in one "
    "query: edges come from GROUPED per-order pair generation (sorted "
    "collect_set -> upper-triangle transform — never a self-join of the "
    "exploded table), and the triangle join runs on DEGREE-ORIENTED "
    "edges (each edge points from the (degree, id)-smaller endpoint), "
    "which bounds every node's out-degree by O(sqrt(edges)) — the "
    "classic fix for the wedge explosion at hub nodes. The oracle "
    "counts the same triangles with the plain 3-way self-join.",
    tags=("bench",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import _bucket_pairs
    from ..operators.graph import oriented_triangle_count

    # dedup_docs folds the old `.distinct()` on (o, part) into the
    # groupBy(o) exchange _bucket_pairs pays anyway (collect_set) —
    # one full shuffle of the lineitem projection removed, same edges
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("doc")
    )
    edges = _bucket_pairs(li, "o", dedup_docs=True).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    return oriented_triangle_count(edges)


# DOULION sampling probability p = _TRI_SAMPLE_NUM / _TRI_SAMPLE_DEN.
# 1/2 keeps the estimator's variance small on the sf-scale test graphs
# (relative SE ~ sqrt((1/p^3 - 1) / T); the co-purchase graph has tens
# of thousands of triangles at sf0.01) while already cutting the
# closure's wedge volume to ~p^2 = 1/4 and the closing join to ~p^3.
_TRI_SAMPLE_NUM = 1
_TRI_SAMPLE_DEN = 2
# the 1/p^3 scale-up below uses floor division; exact only when num^3
# divides den^3 — guard so a future p change can't silently bias the
# estimator (and its oracle, which replays the same floor — r6 ADVICE)
assert _TRI_SAMPLE_DEN**3 % _TRI_SAMPLE_NUM**3 == 0, (
    "DOULION scale factor must be an exact integer: "
    f"{_TRI_SAMPLE_DEN}^3 / {_TRI_SAMPLE_NUM}^3 is not integral"
)


@register(
    "graph_triangle_count_approx",
    # the oracle replays the IDENTICAL deterministic edge sample (md5
    # threshold on the canonical "u:v" key) and counts its triangles
    # with the plain 3-way self-join, then applies the same 1/p^3
    # scale-up — so the hash pins both the sampler and the counter
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ),
    e AS (
        SELECT u, v FROM e0
        WHERE CAST(concat('0x', substr(md5(concat(CAST(u AS VARCHAR), ':',
                   CAST(v AS VARCHAR))), 1, 8)) AS UBIGINT) * {_TRI_SAMPLE_DEN}
              < 4294967296 * {_TRI_SAMPLE_NUM}
    ),
    t AS (
        SELECT count(*) AS n
        FROM e e1 JOIN e e2 ON e1.v = e2.u
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    m AS (SELECT count(*) AS n_edges_sampled FROM e)
    SELECT CAST(n_edges_sampled AS BIGINT) AS n_edges_sampled,
           CAST(t.n AS BIGINT) AS n_triangles_sampled,
           CAST(t.n * {_TRI_SAMPLE_DEN ** 3 // _TRI_SAMPLE_NUM ** 3} AS BIGINT)
               AS est_triangles
    FROM m CROSS JOIN t
    """,
    doc="Approximate triangle counting via DOULION edge sparsification "
    "(Tsourakakis, Kang, Miller & Faloutsos, KDD 2009): keep each edge "
    "independently with probability p, count triangles on the sample "
    "with the same degree-oriented exact counter, scale by 1/p^3 (an "
    "unbiased estimator). The coin flip is a DETERMINISTIC md5 "
    "threshold on the canonical edge key, so results replay bit-for-bit "
    "on any engine — and the triangle join's wedge volume drops by "
    "~p^2 BEFORE any shuffle, which is the scale answer to the "
    "documented wedge-densification superlinearity of the exact "
    "operator (SCALE.md round 5 probe). The 1/p^3 scale-up stays in "
    "exact integer arithmetic.",
    tags=("bench",),
)
def graph_triangle_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.columns import md5_prefix_int
    from ..llm.dedup import _bucket_pairs
    from ..operators.graph import oriented_triangle_count

    # same distinct-into-collect_set fold as graph_triangle_count
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("doc")
    )
    edges = _bucket_pairs(li, "o", dedup_docs=True).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    # exact-integer threshold compare (h * den < 2^32 * num), never a
    # float rate — the verify skill's cross-engine hashing contract
    ekey = F.concat(F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string"))
    h = md5_prefix_int(ekey).cast("decimal(20,0)")
    sampled = edges.where(
        h * _TRI_SAMPLE_DEN < F.lit(4294967296 * _TRI_SAMPLE_NUM).cast("decimal(20,0)")
    )
    counts = oriented_triangle_count(sampled)
    scale = _TRI_SAMPLE_DEN**3 // _TRI_SAMPLE_NUM**3
    return counts.select(
        F.col("n_edges").alias("n_edges_sampled"),
        F.col("n_triangles").alias("n_triangles_sampled"),
        (F.col("n_triangles") * scale).cast("bigint").alias("est_triangles"),
    )


# ---------------------------------------------------------------------------
# Directed containment dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKENS} AS tokens FROM documents),
    sh_all AS (SELECT doc_id AS doc, unnest({_DUCK_SHINGLES}) AS shingle FROM tok),
    keep AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 200),
    sh AS (SELECT doc, sh_all.shingle FROM sh_all JOIN keep ON sh_all.shingle = keep.shingle),
    shared AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc)
    SELECT doc_a, doc_b, shared,
           round(shared / x.n, 4) AS cont_a_in_b,
           round(shared / y.n, 4) AS cont_b_in_a
    FROM shared JOIN sizes x ON doc_a = x.doc JOIN sizes y ON doc_b = y.doc
    WHERE round(shared / x.n, 4) >= 0.5 OR round(shared / y.n, 4) >= 0.5
    """,
    doc="Directed containment near-dedup (shared/|A| per direction, "
    "either >= 0.5): catches the subset relationships Jaccard "
    "structurally misses — a short doc fully quoted inside a long one "
    "scores ~|A|/|B| on Jaccard but 1.0 on containment. Same bucketed "
    "pair generation, stop-shingle cap, and single materialized "
    "shingle aggregate as dedup_ngram_jaccard (llm/dedup.py shares the "
    "overlap-count core between both metrics).",
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, k=3, threshold=0.5, max_shingle_freq=200)


@register(
    "attribution_last_touch",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE event_type <> 'purchase'
    )
    SELECT p.event_id, p.user_id,
           coalesce(b.event_type, 'direct') AS touch_type,
           b.ts AS touch_ts
    FROM p LEFT JOIN LATERAL (
        SELECT event_type, ts FROM t
        WHERE t.user_id = p.user_id AND t.ts < p.ts
        ORDER BY t.ts DESC, t.event_id DESC LIMIT 1
    ) b ON true
    """,
    doc="Last-touch attribution: each purchase credits the user's most "
    "recent preceding non-purchase event ('direct' when none exists) — "
    "the marketing-attribution shape, expressed as a strict-backward "
    "AS-OF join (operators.asof: one equi-shuffle on user_id, range "
    "residual, top-1 window riding the join's partitioning — the "
    "WindowGroupLimit/4-exchange contract merge_delete_backfill "
    "already pins). The oracle is the LATERAL top-1 formulation; "
    "event_id tiebreak makes simultaneous touches deterministic.",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = read_testdata(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.where(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    joined = asof_join(
        purchases,
        touches,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        direction="backward",
        strict=True,
        tiebreak="event_id",
        how="left",
        left_id="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("event_type"), F.lit("direct")).alias("touch_type"),
        F.col("ts_right").alias("touch_ts"),
    )


@register(
    "intervals_merge_overlapping",
    oracle="""
    WITH iv AS (
        SELECT l_suppkey AS suppkey,
               l_shipdate AS s,
               l_shipdate + CAST(l_linenumber * 3 AS INTEGER) * INTERVAL 1 DAY AS e,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    flagged AS (
        SELECT suppkey, s, e, l_orderkey, l_linenumber,
               CASE WHEN max(e) OVER (
                        PARTITION BY suppkey ORDER BY s, e, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) >= s THEN 0 ELSE 1 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT suppkey, s, e,
               sum(new_island) OVER (
                   PARTITION BY suppkey ORDER BY s, e, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING
               ) AS island
        FROM flagged
    )
    SELECT suppkey, CAST(island AS BIGINT) AS island,
           min(s) AS cover_start, max(e) AS cover_end,
           count(*) AS n_intervals
    FROM islands GROUP BY suppkey, island
    """,
    doc="Merge overlapping intervals per key (coverage-window union, the "
    "gaps-and-islands generalization): intervals sorted per supplier, a "
    "new island opens when a start clears the running max end "
    "(ROWS-framed window over the totally ordered partition — ties "
    "broken to the row grain so both engines walk the identical "
    "sequence), island ids by running sum, one aggregate per island. "
    "Two windows + one aggregate, all riding a single supplier-key "
    "shuffle. Interval ends derive deterministically from shipdate + "
    "3*linenumber days (the synthetic schema carries no end column).",
)
def intervals_merge_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_testdata(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").alias("s"),
        # timestampadd, not date_add: shipdate is a TIMESTAMP and
        # date_add would silently truncate it to a DATE
        F.expr("timestampadd(DAY, l_linenumber * 3, l_shipdate)").alias("e"),
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("suppkey")
        .orderBy("s", "e", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.max("e").over(w) >= F.col("s"), F.lit(0)).otherwise(F.lit(1)),
    )
    # the SAME total order as the flag window: tied rows must walk in
    # one sequence or the running island sum assigns ties differently
    w2 = (
        Window.partitionBy("suppkey")
        .orderBy("s", "e", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w2))
    return islands.groupBy("suppkey", "island").agg(
        F.min("s").alias("cover_start"),
        F.max("e").alias("cover_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@register(
    "scd2_dimension_build",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               lag(o_orderpriority) OVER w AS prev_prio
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        FROM ordered
        WHERE prev_prio IS NULL OR o_orderpriority <> prev_prio
    )
    SELECT o_custkey AS custkey,
           o_orderpriority AS priority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w2 AS valid_to,
           lead(o_orderdate) OVER w2 IS NULL AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="SCD Type-2 dimension build from a change log: each customer's "
    "priority history collapses consecutive duplicates (no spurious "
    "versions), then every surviving change opens a validity interval "
    "closed by the next change's date (valid_to NULL = current row) — "
    "the warehouse-dimension pattern the reference's changelog columns "
    "(X8/X9) feed into. Two windows over ONE shuffle on the business "
    "key (both windows partition by custkey, Spark reuses the "
    "partitioning); total order via the orderkey tiebreak.",
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = read_testdata(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .withColumn("prev_prio", F.lag("o_orderpriority").over(w))
        .where(
            F.col("prev_prio").isNull()
            | (F.col("o_orderpriority") != F.col("prev_prio"))
        )
    )
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


@register(
    "incremental_join_maintenance",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(38,8))), 2) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Incremental JOIN-view maintenance: with both sides split into "
    "(old, delta), the maintained join updates as old_join UNION "
    "dA><B_old UNION A_old><dB UNION dA><dB — three delta-scoped joins "
    "whose cost tracks the DELTAS, never a recompute of the TB-scale "
    "old><old (at 100 TB the nightly delta is GBs; this is the "
    "join-side sibling of incremental_agg_maintenance). The oracle is "
    "the full recompute, so the driver hash PROVES the incremental "
    "algebra reconstitutes it exactly.",
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import rounded_sum

    cutoff = "1997-01-01"
    o = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )
    a_old = o.where(F.col("o_orderdate") < cutoff)
    da = o.where(F.col("o_orderdate") >= cutoff)
    b_old = li.where(F.col("l_shipdate") < cutoff)
    db = li.where(F.col("l_shipdate") >= cutoff)

    maintained = (
        a_old.join(b_old, a_old["o_orderkey"] == b_old["l_orderkey"])
        .unionByName(da.join(b_old, da["o_orderkey"] == b_old["l_orderkey"]))
        .unionByName(a_old.join(db, a_old["o_orderkey"] == db["l_orderkey"]))
        .unionByName(da.join(db, da["o_orderkey"] == db["l_orderkey"]))
    )
    return maintained.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        rounded_sum("l_extendedprice", 2).alias("revenue"),
    )


@register(
    "asof_nearest_alignment",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           b.ts AS nearest_view_ts,
           b.delta_us
    FROM p LEFT JOIN LATERAL (
        SELECT v.ts, abs(epoch_us(v.ts) - epoch_us(p.ts)) AS delta_us
        FROM v WHERE v.user_id = p.user_id
        ORDER BY delta_us ASC, v.ts ASC, v.event_id DESC LIMIT 1
    ) b ON true
    """,
    doc="Nearest-neighbor time alignment (operators.asof "
    "direction='nearest'): each purchase pairs with the user's CLOSEST "
    "view in either direction — the sensor/series alignment semantics "
    "backward/forward as-of joins cannot express. Distance compares in "
    "exact integer microseconds (a double delta could tie-break wrong "
    "in the last ulp); equidistant candidates prefer the earlier view. "
    "Same single-shuffle + partial-top-1 plan as the other as-of "
    "directions.",
)
def asof_nearest_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = read_testdata(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        direction="nearest",
        tiebreak="event_id",
        how="left",
        left_id="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_right").alias("nearest_view_ts"),
        F.abs(F.unix_micros("ts_right") - F.unix_micros("ts")).alias("delta_us"),
    )


_CF_BASKET_CAP = 1000  # hot-basket guard: a B-part basket emits B(B-1)/2 pairs
_CF_MIN_SUPPORT = 2  # singleton co-occurrences are noise AND ~30x the volume
_CF_TOPK = 3


@register(
    "recsys_item_cooccurrence_topk",
    oracle=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sz AS (SELECT c, count(*) AS n FROM cp GROUP BY c),
    keep AS (SELECT cp.c, cp.p FROM cp JOIN sz ON cp.c = sz.c WHERE sz.n <= {_CF_BASKET_CAP}),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS cij
        FROM keep a JOIN keep b ON a.c = b.c AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= {_CF_MIN_SUPPORT}
    ),
    ci AS (SELECT p, count(*) AS n FROM keep GROUP BY p),
    sym AS (
        SELECT pa AS item, pb AS other, cij FROM pairs
        UNION ALL
        SELECT pb, pa, cij FROM pairs
    ),
    scored AS (
        SELECT s.item, s.other,
               round(s.cij / sqrt(x.n * y.n), 6) AS cosine
        FROM sym s JOIN ci x ON s.item = x.p JOIN ci y ON s.other = y.p
    )
    SELECT item, other, cosine, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY item ORDER BY cosine DESC, other ASC
        ) AS rank FROM scored
    ) WHERE rank <= {_CF_TOPK}
    """,
    doc="Item-item collaborative filtering (the Amazon item2item shape): "
    "customers' purchase baskets -> co-occurrence counts -> binary "
    "cosine sim(i,j) = c_ij / sqrt(c_i*c_j) -> top-3 neighbors per "
    "item. Pairs come from GROUPED per-basket generation (sorted "
    "collect_set -> upper-triangle transform, one shuffle on the "
    "customer, never a self-join of the exploded basket table), with a "
    "basket-size cap as the hot-user guard — a B-part basket emits "
    "B(B-1)/2 pairs, and power users are exactly the baskets that blow "
    "up at corpus scale (the cap also keeps c_i on the same pruned "
    "universe, so numerator and denominator agree). Top-k per item is "
    "a WindowGroupLimit.",
    tags=("bench",),
)
def recsys_item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    lineitem = read_testdata(spark, sf_dir, "lineitem")

    # ONE post-join exchange instead of three: the (customer, part)
    # dedup, the basket-size profile, and the hot-user cap all fold
    # into a single groupBy(c).collect_set — sort_array(collect_set)
    # equals the old distinct -> collect_list row for row, sizes
    # become size(__ps), and the cap becomes a filter on the grouped
    # row instead of an aggregate + join back. (The r13 before-plan
    # shows the old chain: Exchange(c,p) for the distinct, Exchange(c)
    # for sizes, join, Exchange(c) for the pair groupBy.)
    from ..operators.partitioning import pinned_group_repartition

    # the pinned repartition (reused by the groupBy — no extra
    # exchange) keeps the basket explode below at full width: AQE
    # otherwise coalesces this exchange to the grouped BYTES (~2
    # partitions at sf0.1) and the quadratic pair explode serializes
    # (measured 10.7 -> 2.0 s for the pair stage once pinned)
    baskets = (
        pinned_group_repartition(
            orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
            .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")),
            "c",
        )
        .groupBy("c")
        .agg(F.sort_array(F.collect_set("p")).alias("__ps"))
        .where(F.size("__ps") <= _CF_BASKET_CAP)
        .localCheckpoint(eager=False)  # feeds ci AND the pair counts
    )
    # c_i on the same capped universe as the pair counts
    ci = baskets.select(F.explode("__ps").alias("p")).groupBy("p").agg(
        F.count(F.lit(1)).alias("n")
    )
    pair_structs = F.expr(
        "transform(__ps, (x, i) ->"
        " transform(slice(__ps, i + 2, size(__ps)),"
        " y -> struct(x AS pa, y AS pb)))"
    )
    pairs = (
        baskets.select(F.explode(F.flatten(pair_structs)).alias("pp"))
        .select(F.col("pp.pa").alias("pa"), F.col("pp.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cij"))
        .where(F.col("cij") >= _CF_MIN_SUPPORT)
    )
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("other"), "cij"
    ).unionByName(
        pairs.select(F.col("pb").alias("item"), F.col("pa").alias("other"), "cij")
    )
    cx = ci.select(F.col("p").alias("item"), F.col("n").alias("nx"))
    cy = ci.select(F.col("p").alias("other"), F.col("n").alias("ny"))
    scored = (
        sym.join(cx, "item")
        .join(cy, "other")
        .select(
            "item",
            "other",
            F.round(F.col("cij") / F.sqrt(F.col("nx") * F.col("ny")), 6).alias("cosine"),
        )
    )
    return top_n_per_group(
        scored,
        ["item"],
        [F.col("cosine").desc(), F.col("other").asc()],
        n=_CF_TOPK,
        rank_col="rank",
        keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# EWMA daily smoothing
# ---------------------------------------------------------------------------


@register(
    "stats_ewma_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               max(day) AS last_day,
               list(v ORDER BY day) AS vals
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, last_day,
           round(list_reduce(vals, (acc, x) -> (x + acc) / 2.0), 6) + 0.0 AS ewma
    FROM series
    """,
    doc="Exponentially smoothed daily metric per event type (EWMA, "
    "alpha=0.5): daily totals via order-independent DECIMAL sums, then "
    "one ordered fold s_t = (x_t + s_{t-1})/2 per type — the trend "
    "baseline the volume-anomaly monitor compares against. alpha=0.5 "
    "keeps every fold step an exact halving (binary-exact), and the "
    "fold order is pinned by the date sort, so the result is "
    "bit-identical on any engine. The per-type day count is calendar-"
    "bounded (not data-bounded), so the collected array stays O(days) "
    "at any corpus size.",
)
def stats_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(38,8)")).cast("double").alias("v"))
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("day").alias("last_day"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))), lambda x: x["v"]
        ).alias("vals"),
    )
    ewma = F.expr(
        "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1),"
        " (acc, x) -> (x + acc) / 2.0)"
    )
    return series.select(
        "event_type",
        "n_days",
        "last_day",
        (F.round(ewma, 6) + F.lit(0.0)).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Arrow-native embedding ops (mapInArrow / applyInArrow)
# ---------------------------------------------------------------------------


def _normalize_arrow_batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
    import numpy as np
    import pyarrow as pa

    for batch in it:
        if batch.num_rows == 0:
            continue
        vec_ids = batch.column("vec_id")
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):  # pragma: no cover - single chunk per batch
            emb = emb.combine_chunks()
        offsets = emb.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        # an EMPTY vector (not null — nulls are filtered upstream) has
        # no norm: emit unit=[] / norm=null, matching the SQL twin
        # (sum over an empty list is NULL). dim comes from the
        # non-empty rows; ragged non-empty rows break the reshape
        # contract loudly.
        nonempty = widths > 0
        dims = np.unique(widths[nonempty])
        if len(dims) > 1:
            raise ValueError("embedding_normalize_arrow requires fixed-width vectors")
        n_rows = batch.num_rows
        norm_out = np.full(n_rows, None, dtype=object)
        unit_out = [[] for _ in range(n_rows)]
        if len(dims):
            dim = int(dims[0])
            flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
            m = flat.reshape(-1, dim)
            # accumulate dim-by-dim: sequential left-to-right adds, the
            # same order DuckDB's list_aggregate('sum') uses — numpy's
            # pairwise np.sum would round differently
            acc = np.zeros(m.shape[0], dtype=np.float64)
            for j in range(dim):
                acc += m[:, j] * m[:, j]
            norm = np.sqrt(acc)
            safe = np.where(norm == 0.0, 1.0, norm)
            unit = m / safe[:, None]
            full_rows = np.flatnonzero(nonempty)
            for k, i in enumerate(full_rows):
                norm_out[i] = norm[k]
                unit_out[i] = None if norm[k] == 0.0 else unit[k]
        yield pa.RecordBatch.from_arrays(
            [
                vec_ids,
                pa.array(unit_out, type=pa.list_(pa.float64())),
                pa.array(norm_out, type=pa.float64()),
            ],
            names=["vec_id", "unit", "norm"],
        )


@register(
    "embedding_normalize_arrow",
    # output is EXPLODED to (vec_id, dim, unit_component, norm) rows —
    # the r5 review found the array<double> column correct but
    # non-canonicalizable by the driver's pandas sort_values (unhashable
    # list cells); per-dimension rows are the shape its green sibling
    # embedding_label_minmax_arrow uses. DuckDB's unnest drops NULL and
    # empty lists exactly as Spark's posexplode does, so zero-norm
    # vectors (unit=NULL) vanish from both sides consistently.
    oracle="""
    WITH base AS (
        SELECT vec_id,
               list_aggregate(
                   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   'sum') AS s2
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (SELECT vec_id, sqrt(s2) AS norm FROM base),
    u AS (
        SELECT e.vec_id, n.norm,
               CASE WHEN n.norm = 0 THEN NULL
                    ELSE list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.norm)
               END AS unit
        FROM embeddings e JOIN n ON e.vec_id = n.vec_id
    )
    SELECT vec_id,
           CAST(generate_subscripts(unit, 1) AS INT) AS dim,
           round(unnest(unit), 6) + 0.0 AS unit_component,
           round(norm, 6) AS norm
    FROM u
    """,
    doc="L2 normalization over Arrow buffers (PySpark 4 mapInArrow): "
    "numpy reads the list<float> column zero-copy, squares exactly in "
    "float64 (24-bit mantissas square within 53 bits), and accumulates "
    "dimension-by-dimension so the add order matches a sequential list "
    "fold. The UDF emits RAW doubles; all rounding happens JVM-side "
    "(F.round) so the cross-engine rounding contract stays in one "
    "place. No pandas conversion anywhere — this is the narrow-waist "
    "pattern for putting real encoder/codec kernels on the hot path. "
    "The unit vector is posexploded to one row per dimension so every "
    "output column is a scalar (hash-canonicalizable).",
)
def embedding_normalize_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    out = emb.select("vec_id", "embedding").mapInArrow(
        _normalize_arrow_batches, "vec_id long, unit array<double>, norm double"
    )
    exploded = out.select(
        "vec_id",
        F.round("norm", 6).alias("norm"),
        F.posexplode("unit").alias("__d0", "__u"),
    )
    # `+ 0.0` collapses IEEE -0.0 (a negative component rounding to
    # zero) onto +0.0, matching the oracle's identical normalization
    return exploded.select(
        "vec_id",
        (F.col("__d0") + 1).cast("int").alias("dim"),
        (F.round("__u", 6) + F.lit(0.0)).alias("unit_component"),
        "norm",
    )


def _label_minmax_arrow(tbl: "pa.Table") -> "pa.Table":  # noqa: F821
    import numpy as np
    import pyarrow as pa

    label = tbl.column("label")[0].as_py()
    emb = tbl.column("embedding").combine_chunks()
    offsets = emb.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    dim = int(widths[0]) if len(widths) else 0
    if not (widths == dim).all():
        raise ValueError("embedding_label_minmax_arrow requires fixed-width vectors")
    m = emb.values.to_numpy(zero_copy_only=False).reshape(-1, dim)
    return pa.table(
        {
            "label": pa.array([label] * dim, type=pa.int32()),
            "dim": pa.array(np.arange(1, dim + 1, dtype=np.int32)),
            "min_v": pa.array(m.min(axis=0).astype(np.float64)),
            "max_v": pa.array(m.max(axis=0).astype(np.float64)),
            "n": pa.array([m.shape[0]] * dim, type=pa.int64()),
        }
    )


@register(
    "embedding_label_minmax_arrow",
    oracle="""
    SELECT label, CAST(i AS INT) AS dim,
           CAST(min(v) AS DOUBLE) AS min_v,
           CAST(max(v) AS DOUBLE) AS max_v,
           count(*) AS n
    FROM (
        SELECT label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE embedding IS NOT NULL
    )
    GROUP BY label, i
    """,
    doc="Per-label, per-dimension [min, max] envelopes (PySpark 4 "
    "applyInArrow): each label group lands in the UDF as ONE Arrow "
    "table, numpy reduces columns without any pandas detour — the "
    "grouped-kernel pattern (quantizer ranges, feature clipping "
    "bounds) on exact comparisons only, so no rounding contract is "
    "needed at all. Min/max/count are order-independent; float32 "
    "values cast to float64 exactly on both engines.",
)
def embedding_label_minmax_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    return (
        emb.select("label", "embedding")
        .groupBy("label")
        .applyInArrow(
            _label_minmax_arrow,
            "label int, dim int, min_v double, max_v double, n long",
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed peel rounds) + label-propagation
# communities, both over the REPEAT co-purchase graph (parts sharing
# >= 2 distinct orders — the thresholded, sparse sibling of the
# triangle-count graph, where iterative structure actually emerges)
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4
_KCORE_MIN_SHARED = 2

# Shared CTE prefix: li -> thresholded undirected pairs -> symmetric e0
_COPURCHASE_E0_SQL = f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    und AS (
        SELECT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {_KCORE_MIN_SHARED}
    ),
    e0 AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und)"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _COPURCHASE_E0_SQL: grouped per-order pair
    generation with multiplicity (never an exploded self-join), one
    map-side-combined shared-order count, symmetric union, eagerly
    checkpointed for iterative consumers."""
    from ..llm.dedup import _bucket_pairs

    # dedup_docs folds the old `.distinct()` on (o, part) into the
    # groupBy(o) exchange _bucket_pairs pays anyway (collect_set per
    # order = distinct within the order, and the order IS the bucket
    # key) — one full shuffle of the lineitem projection removed for
    # every iterative consumer (LPA, k-core, BFS); same edges, same
    # shared-order multiplicities (r13, same fold as graph_triangle_count)
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("doc")
    )
    und = (
        # multiplicity = shared orders
        _bucket_pairs(li, "o", distinct_pairs=False, dedup_docs=True)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _KCORE_MIN_SHARED)
    )
    return (
        und.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(und.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )


def _kcore_oracle() -> str:
    base = _COPURCHASE_E0_SQL
    steps = []
    for r in range(1, _KCORE_ROUNDS + 1):
        p = r - 1
        steps.append(f"""
    k{r} AS (SELECT src AS node FROM e{p} GROUP BY src HAVING count(*) >= {_KCORE_K}),
    e{r} AS (
        SELECT e.src, e.dst FROM e{p} e
        JOIN k{r} a ON e.src = a.node JOIN k{r} b ON e.dst = b.node
    )""")
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{_KCORE_ROUNDS} GROUP BY src
    """
    )


@register(
    "graph_kcore_fixed",
    oracle=_kcore_oracle(),
    doc=f"k-core peeling ({_KCORE_ROUNDS} rounds toward the {_KCORE_K}-core) "
    "over the repeat co-purchase graph (parts sharing >= "
    f"{_KCORE_MIN_SHARED} distinct orders): each round drops every node "
    f"whose current degree is < {_KCORE_K}, which lowers its neighbors' "
    "degrees and cascades — the standard dense-subgraph / spam-cluster "
    "extractor, and (with PageRank's fixed-iteration contract) the "
    "monotone-shrinkage member of the iterative-graph family: state "
    "only ever gets SMALLER, so per-round cost falls. Edges come from "
    "GROUPED per-order pair generation with multiplicity "
    "(llm.dedup._bucket_pairs, never an exploded self-join), the "
    "shared-order count is one map-side-combined aggregate, and each "
    "peel round is one degree aggregate plus two semi-style equi-joins "
    "on the shrinking keep-set, localCheckpointed so lineage stays "
    "flat. Output (node, final-round degree) is pure integers — "
    "bit-stable on any partitioning; the oracle unrolls the identical "
    "rounds as plain CTEs.",
    tags=("bench",)
)
def graph_kcore_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel

    edges = _copurchase_edges(spark, sf_dir)
    core = kcore_peel(edges, _KCORE_K, _KCORE_ROUNDS)
    return core.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (fixed synchronous rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    base = (
        _COPURCHASE_E0_SQL
        + """,
    l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e0)"""
    )
    steps = []
    for r in range(1, _LPA_ROUNDS + 1):
        p = r - 1
        steps.append(f"""
    v{r} AS (
        SELECT e.src AS node, l.lab, count(*) AS c
        FROM e0 e JOIN l{p} l ON e.dst = l.node
        GROUP BY 1, 2
    ),
    l{r} AS (
        SELECT node, lab FROM (
            SELECT node, lab,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, lab ASC) AS rn
            FROM v{r}
        ) WHERE rn = 1
    )""")
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
    SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_node
    FROM l{_LPA_ROUNDS} GROUP BY lab
    """
    )


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    doc=f"Synchronous label propagation ({_LPA_ROUNDS} fixed rounds) on "
    "the repeat co-purchase graph — community DETECTION, the "
    "assortative-cluster complement to connected components (which "
    "only finds reachability islands) and k-core (which finds density "
    "floors). Every node starts labeled with itself; each round it "
    "adopts its neighbors' modal label (ties to the smallest label — "
    "the determinism contract that lets fixed-round LPA hash-match "
    "across engines, since free-tie LPA is famously run-dependent). "
    "Per round: ONE shuffle for the (node, label) vote counts (edges "
    "join the label vector, map-side combined) and a WindowGroupLimit "
    "argmax — the per-iteration cost profile of graph_pagerank_fixed, "
    "with per-round localCheckpoints keeping lineage flat. Output is "
    "per-community membership (size + smallest member), pure integers.",
    tags=("bench",)
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir)
    labels = label_propagation(edges, _LPA_ROUNDS)
    return labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_node"),
    )


# ---------------------------------------------------------------------------
# Multi-source BFS shortest paths (fixed relaxation rounds)
# ---------------------------------------------------------------------------

_BFS_ROUNDS = 4
_BFS_SOURCE_MAX = 3  # sources = nodes with id <= this


def _bfs_oracle() -> str:
    base = (
        _COPURCHASE_E0_SQL
        + f""",
    d0 AS (SELECT DISTINCT src AS node, 0 AS dist FROM e0
           WHERE src <= {_BFS_SOURCE_MAX})"""
    )
    steps = []
    for r in range(1, _BFS_ROUNDS + 1):
        p = r - 1
        steps.append(f"""
    relax{r} AS (
        SELECT e.dst AS node, min(d.dist) + 1 AS dist
        FROM e0 e JOIN d{p} d ON e.src = d.node
        GROUP BY e.dst
    ),
    d{r} AS (
        SELECT node, CAST(min(dist) AS INT) AS dist FROM (
            SELECT node, dist FROM d{p} UNION ALL SELECT node, dist FROM relax{r}
        ) GROUP BY node
    )""")
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
    SELECT node, dist FROM d{_BFS_ROUNDS}
    """
    )


@register(
    "graph_bfs_distances",
    oracle=_bfs_oracle(),
    doc=f"Multi-source BFS ({_BFS_ROUNDS} relaxation rounds) on the "
    "repeat co-purchase graph: unweighted shortest-path distance from "
    f"the source set (nodes <= {_BFS_SOURCE_MAX}) — the frontier-"
    "propagation member of the iterative-graph family (reachability "
    "radius, contamination spread, link-distance features). Each round "
    "is ONE relaxation shuffle (edge list joined to the current "
    "distance vector, map-side-combined min per destination) unioned "
    "with the prior vector under a min — monotone like k-core "
    "(distances only ever DROP or stay), so fixed rounds give exactly "
    "the <= R-hop distance truth on both engines. Integer output; the "
    "oracle unrolls identical rounds.",
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    dist = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") <= _BFS_SOURCE_MAX)
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    for _ in range(_BFS_ROUNDS):
        relax = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


# ---------------------------------------------------------------------------
# ALS matrix factorization (rank 2, fixed alternating solves)
# ---------------------------------------------------------------------------
#
# The third driver-hash-verified DISTRIBUTED TRAINER (after k-means and
# BPE): alternating least squares on the implicit customer-part rating
# matrix. Rank 2 keeps the per-entity normal equations CLOSED-FORM (a
# 2x2 solve is plain arithmetic), which is what lets a SQL oracle
# replay the whole training run — no matrix library on either engine.
# The determinism contract is the repo's standard one: every
# accumulation rounds its addends at 10 decimals and sums in
# DECIMAL(38,10) (order-independent), every solved factor rounds at 8,
# and the init factors are exact integer md5 fractions, so the learned
# factors are bit-identical on any partitioning and any engine.

_ALS_LAMBDA = 0.1
_ALS_OUT_USERS = 300


def _als_init_sql(salt: str) -> str:
    return (
        f"(1000 + 8 * (CAST(concat('0x', substr(md5(CAST(k AS VARCHAR) || "
        f"'{salt}'), 1, 8)) AS UBIGINT) % 10000)) / 100000.0"
    )


def _als_solve_sql(out: str, key: str, other: str, facts: str) -> str:
    lam = _ALS_LAMBDA
    det = f"((a11 + {lam}) * (a22 + {lam}) - a12 * a12)"
    return f"""
    {out} AS (
        SELECT k,
               round(((a22 + {lam}) * b1 - a12 * b2) / {det}, 8) AS f1,
               round(((a11 + {lam}) * b2 - a12 * b1) / {det}, 8) AS f2
        FROM (
            SELECT r.{key} AS k,
                   CAST(sum(CAST(round(f.f1 * f.f1, 10) AS DECIMAL(38,10))) AS DOUBLE) AS a11,
                   CAST(sum(CAST(round(f.f1 * f.f2, 10) AS DECIMAL(38,10))) AS DOUBLE) AS a12,
                   CAST(sum(CAST(round(f.f2 * f.f2, 10) AS DECIMAL(38,10))) AS DOUBLE) AS a22,
                   CAST(sum(CAST(round(f.f1 * r.r, 10) AS DECIMAL(38,10))) AS DOUBLE) AS b1,
                   CAST(sum(CAST(round(f.f2 * r.r, 10) AS DECIMAL(38,10))) AS DOUBLE) AS b2
            FROM ratings r JOIN {facts} f ON r.{other} = f.k
            GROUP BY r.{key}
        )
    )"""


def _als_oracle() -> str:
    return (
        f"""
    WITH ratings AS (
        SELECT o.o_custkey AS u, l.l_partkey AS it,
               CAST(round(sum(CAST(l.l_quantity AS DECIMAL(30,8))), 0) AS DOUBLE) AS r
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    q0 AS (
        SELECT k, {_als_init_sql("a")} AS f1, {_als_init_sql("b")} AS f2
        FROM (SELECT DISTINCT it AS k FROM ratings)
    ),"""
        + _als_solve_sql("p1", "u", "it", "q0")
        + ","
        + _als_solve_sql("q1", "it", "u", "p1")
        + ","
        + _als_solve_sql("p2", "u", "it", "q1")
        + f"""
    SELECT k AS u, f1 + 0.0 AS f1, f2 + 0.0 AS f2
    FROM p2 WHERE k <= {_ALS_OUT_USERS}
    """
    )


def als_init_factors(ratings: DataFrame, side: str) -> DataFrame:
    """Deterministic rank-2 init for ``side``'s entities: each factor is
    an EXACT integer md5 fraction (1000 + 8*(h % 10000)) / 1e5 — no
    float rounding anywhere, so both engines start identically."""
    from ..functions.columns import md5_prefix_int

    def init_col(salt: str):
        h = (
            md5_prefix_int(F.concat(F.col("k").cast("string"), F.lit(salt)))
            .cast("decimal(10,0)")
            % 10000
        )
        return (F.lit(1000) + F.lit(8) * h).cast("double") / F.lit(100000.0)

    return (
        ratings.select(F.col(side).alias("k"))
        .distinct()
        .select("k", init_col("a").alias("f1"), init_col("b").alias("f2"))
    )


def als_solve_rank2(
    ratings: DataFrame, facts: DataFrame, key: str, other: str, lam: float = _ALS_LAMBDA
) -> DataFrame:
    """One ALS half-sweep: solve ``key``'s rank-2 ridge factors from
    ``other``'s current factors. ratings = (u, it, r); facts =
    (k, f1, f2) keyed by ``other``. Two shuffles (join on ``other``,
    groupBy ``key``); the five Gram/moment sums round addends at 10
    and accumulate in DECIMAL so the solve is order-exact; output
    factors round at 8 (the cross-engine determinism contract)."""

    def dsum(c):
        return F.sum(F.round(c, 10).cast("decimal(38,10)")).cast("double")

    j = ratings.join(facts, ratings[other] == facts["k"])
    s = j.groupBy(ratings[key].alias("k")).agg(
        dsum(F.col("f1") * F.col("f1")).alias("a11"),
        dsum(F.col("f1") * F.col("f2")).alias("a12"),
        dsum(F.col("f2") * F.col("f2")).alias("a22"),
        dsum(F.col("f1") * F.col("r")).alias("b1"),
        dsum(F.col("f2") * F.col("r")).alias("b2"),
    )
    det = (F.col("a11") + lam) * (F.col("a22") + lam) - F.col("a12") * F.col("a12")
    return s.select(
        "k",
        F.round(((F.col("a22") + lam) * F.col("b1") - F.col("a12") * F.col("b2")) / det, 8).alias("f1"),
        F.round(((F.col("a11") + lam) * F.col("b2") - F.col("a12") * F.col("b1")) / det, 8).alias("f2"),
    ).localCheckpoint(eager=True)



@register(
    "recsys_als_train_rank2",
    oracle=_als_oracle(),
    doc="Distributed ALS matrix-factorization TRAINING (rank 2, two "
    "alternating half-sweeps + final user solve) on the implicit "
    "customer-part quantity matrix — the collaborative-filtering "
    "trainer behind recsys_item_cooccurrence_topk's serving path. "
    "Rank 2 makes each entity's ridge normal equations closed-form, "
    "so a solve is: join ratings to the other side's factor vector, "
    "ONE map-side-combined groupBy accumulating the five Gram/moment "
    "sums (addends rounded at 10, summed in DECIMAL — order-exact), "
    "then plain-arithmetic 2x2 inversion per entity, factors rounded "
    "at 8. Exactly two shuffles per solve at any scale; the model "
    "never crosses the driver at all (factors live distributed). "
    "Init is exact integer md5 fractions. The oracle replays all "
    "three solves as unrolled CTEs — a bit-identical training run "
    "with no linear-algebra library on either engine.",
)
def recsys_als_train_rank2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    li = read_testdata(spark, sf_dir, "lineitem")
    ratings = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it"))
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(30,8)")), 0)
            .cast("double")
            .alias("r")
        )
        .localCheckpoint(eager=True)  # consumed by all three solves
    )
    facts = als_init_factors(ratings, "it")
    p = als_solve_rank2(ratings, facts, "u", "it")  # user factors from item init
    q = als_solve_rank2(ratings, p, "it", "u")  # item factors from user factors
    p = als_solve_rank2(ratings, q, "u", "it")  # final user solve
    return p.where(F.col("k") <= _ALS_OUT_USERS).select(
        F.col("k").alias("u"),
        (F.col("f1") + F.lit(0.0)).alias("f1"),
        (F.col("f2") + F.lit(0.0)).alias("f2"),
    )


# ---------------------------------------------------------------------------
# Stored BM25 inverted index: build -> nightly MERGE -> manifest-pruned serve
# ---------------------------------------------------------------------------

# Term-bucket count, the index's serving-partition grain. 8 keeps the
# fixture's manifests small; a 100-TB deployment raises it to O(10^3)
# so a query touching t terms reads ~t/10^3 of the posting bytes —
# the knob trades manifest size against pruning selectivity, exactly
# like the IVF index's n_centroids.
_BM25_TB = 8


def _term_bucket_py(token: str) -> int:
    """Python twin of the Spark term-bucket expression (md5-prefix mod
    _BM25_TB): serving computes the query terms' buckets DRIVER-side
    (model-sized work) to build the manifest partition_filter. Parity
    with the Spark/DuckDB twins is the repo's standard md5 contract
    (functions.columns.md5_prefix_int)."""
    import hashlib

    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % _BM25_TB


def _term_bucket_col(token):
    from ..functions.columns import md5_prefix_int

    return (md5_prefix_int(token).cast("decimal(10,0)") % _BM25_TB).cast("int")


def _bm25_postings(docs: DataFrame, seg: int) -> DataFrame:
    """One segment's posting rows ``(token, doc_id, tf, dl, seg, tb)``.

    dl (the document's token count) is DENORMALIZED into every posting
    — the Lucene norms-per-posting shape — so serving needs ONLY the
    query terms' posting partitions plus the 1-row stats table: never
    a doc-level length join, never a corpus scan, at query time. The
    per-posting cost is one extra int; the per-query win is an entire
    table's absence from the serving path."""
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token")).where(
        F.col("token") != ""
    )
    # tf fans out to dl AND the posting rows; checkpoint so the
    # tokenize/explode/aggregate subtree runs once per segment build
    # (the _bm25_scores lesson — Catalyst does not reuse the subtree)
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # merge pin: dl is DOC-sized behind a checkpoint whose bare scan
    # AQE can never measure (the r6 checkpoint-broadcast hazard)
    return tf.join(dl.hint("merge"), "doc_id").select(
        "token",
        "doc_id",
        "tf",
        "dl",
        F.lit(seg).alias("seg"),
        _term_bucket_col(F.col("token")).alias("tb"),
    )


def _bm25_seg_stats(docs: DataFrame, postings: DataFrame) -> DataFrame:
    """One segment's contribution to the corpus stats row: n_docs
    counts EVERY document (empty-token docs too — the same population
    _bm25_scores' nd aggregate counts), total_len sums tf over the
    segment's postings (= sum of dl over its docs)."""
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tl = postings.agg(
        F.coalesce(F.sum("tf"), F.lit(0)).cast("bigint").alias("total_len")
    )
    return nd.crossJoin(tl).select(F.lit(0).alias("sid"), "n_docs", "total_len")


def _bm25_index_root(spark: SparkSession, docs: DataFrame, name: str) -> str:
    """Build the historic BM25 index, MERGE the arriving batch, return
    the table root — the nightly index-maintenance job (r10 verdict
    ask #1, mirroring workloads.llm._served_signature_table).

    Layout: ``postings`` partitioned by (seg, tb) — seg is the ingest
    segment (the Lucene segment model: a nightly merge WRITES only its
    own segment's partitions, so historic posting files are never
    rewritten even though batch terms scatter across every term
    bucket), tb the term bucket serving prunes on (partition_filter
    matches tb across all segments). ``stats`` is the 1-row corpus
    aggregate (n_docs, total_len), upserted per merge by pure
    addition — reading it is O(1), so serving never scans a doc-level
    table for the average document length.

    The arriving batch is doc_id % 5 = 0 (the repo's standard arrival
    stand-in); historic/batch doc sets are disjoint, tokenization is
    deterministic, and posting values are exact ints — so the
    post-merge index equals the full-corpus index and the FULL-corpus
    oracle pins the whole store->merge->serve chain: a merge that
    drops, duplicates, or mis-buckets a posting changes tf/df/dl and
    flips the hash. Both tables ride the shared lifecycle module
    (sinks/indexes.py, r11 verdict ask #6 — same calls, same layout);
    the root embeds the pid (r9 ADVICE)."""
    from ..sinks.indexes import IncrementalIndexStore, fresh_index_root

    root = fresh_index_root(name)
    hist_docs = docs.where(F.col("doc_id") % 5 != 0)
    batch_docs = docs.where(F.col("doc_id") % 5 == 0)

    hist_p = _bm25_postings(hist_docs, seg=0)
    postings = IncrementalIndexStore(
        spark, f"{root}/postings", keys=["token", "doc_id"], partition_by=["seg", "tb"]
    ).build(hist_p)
    stats = IncrementalIndexStore(
        spark, f"{root}/stats", keys=["sid"], partition_by=["sid"]
    ).build(_bm25_seg_stats(hist_docs, hist_p))

    # nightly MERGE: tokenize the BATCH only; postings land in the
    # batch's own segment partitions (copy-on-write touches no
    # seg=0 entry — pytest pins the historic manifest byte-identical),
    # stats update by adding the batch's contribution to the stored row
    batch_p = _bm25_postings(batch_docs, seg=1)
    postings.merge(batch_p)
    new_stats = (
        stats.serve()
        .unionByName(_bm25_seg_stats(batch_docs, batch_p))
        .groupBy("sid")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_len").cast("bigint").alias("total_len"),
        )
    )
    stats.merge(new_stats)
    return root


def _bm25_scores_served(spark: SparkSession, root: str) -> DataFrame:
    """BM25 scores (query_id, doc_id, score) SERVED from the stored
    inverted index: the query terms' buckets prune the posting read at
    the MANIFEST (only those tb partitions' files are ever opened —
    across every segment), df comes from the pruned posting lists
    themselves (exact: a token's postings live wholly in its bucket),
    and corpus stats are the 1-row stats table. Query-time cost is
    posting-list-sized — no corpus scan, no tokenization, no doc-level
    join (dl rides in each posting). Same round-8/DECIMAL/round-4
    determinism contract as _bm25_scores, so the two serve identical
    scores."""
    from ..sinks.indexes import IncrementalIndexStore
    from ..sinks.versioned import read_versioned_table

    queries = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id string, token string",
    )
    buckets = sorted({_term_bucket_py(t) for _, terms in _BM25_QUERIES for t in terms})
    postings = IncrementalIndexStore(
        spark, f"{root}/postings", keys=["token", "doc_id"], partition_by=["seg", "tb"]
    ).serve({"tb": buckets})
    # the pruned read fans out to dfreq AND scoring; checkpoint so the
    # posting partitions are read once
    p_q = postings.join(
        F.broadcast(queries.select("token").distinct()), "token"
    ).localCheckpoint(eager=False)
    # document frequency per query term — a <=|query terms|-row
    # contraction of the posting lists (intent broadcast below)
    dfreq = p_q.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = read_versioned_table(spark, f"{root}/stats").select("n_docs", "total_len")

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    s = (
        idf
        * (F.col("tf") * F.lit(_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / avgdl)
        )
    )
    term_scores = (
        p_q.join(F.broadcast(queries), "token")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", s.alias("s"))
    )
    return term_scores.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(F.round(F.col("s"), 8).cast("decimal(30,8)")), 4)
        .cast("double")
        .alias("score")
    )


@register(
    "retrieval_bm25_served",
    # disjoint historic/batch doc sets + deterministic tokenization +
    # integer posting values mean the post-merge index equals the
    # full-corpus index, so the SAME oracle as retrieval_bm25_topk
    # pins the whole build->store->merge->pruned-read->score chain
    oracle=_bm25_oracle(),
    doc="BM25 top-5 SERVED FROM A STORED INVERTED INDEX (r10 verdict "
    "ask #1 — retrieval_bm25_topk rebuilds tf/df/doclen from the "
    "corpus per query): posting lists (token, doc_id, tf, dl) live in "
    "the versioned lakehouse partitioned by (ingest segment, term "
    "bucket); the nightly job tokenizes the ARRIVING BATCH only "
    "(doc_id % 5 = 0) and MERGEs its postings as one atomic version "
    "that writes only the batch segment's partitions (the Lucene "
    "segment model — historic posting files are never rewritten), "
    "while the 1-row corpus-stats table updates by addition. Serving "
    "prunes the posting read to the query terms' buckets AT THE "
    "MANIFEST, takes df from the pruned lists, dl from the posting "
    "rows (denormalized, Lucene-norms style), and stats from one row "
    "— query-time cost is posting-list-sized, never a corpus scan or "
    "tokenization. The full-corpus oracle hash-pins the entire "
    "store->merge->serve chain.",
)
def retrieval_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    root = _bm25_index_root(spark, docs, "bm25srv")
    return top_n_per_group(
        _bm25_scores_served(spark, root),
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        n=_BM25_TOPK,
        rank_col="rank",
        keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


def _rrf_served_oracle() -> str:
    """Hybrid-RRF-served replay: the sparse half is the full-corpus BM25
    CTE (store->merge is value-preserving, see retrieval_bm25_served);
    the dense half replays the FIXED-centroid IVF serving path — cell
    assignment (rn=1), 2-cell probing per anchor, exact cosine inside
    probed cells, pool top-20 — then the same RRF fusion as
    _rrf_oracle. Every stage deterministic, one value hash over both
    index lifecycles."""
    from .llm import _IVF_FIXED_CENTROIDS

    rows = ",\n        ".join(
        f"({cid}, {[float(x) for x in c]}::DOUBLE[])"
        for cid, c in enumerate(_IVF_FIXED_CENTROIDS)
    )
    a_values = ", ".join(f"('{qid}', {vid})" for qid, vid in _RRF_ANCHORS)
    return f"""
    WITH {_bm25_scored_sql()},
    cent AS (
        SELECT cid, c, sqrt(list_dot_product(c, c)) AS cnrm
        FROM (VALUES {rows}) AS t(cid, c)
    ),
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    ranked_cells AS (
        SELECT e.vec_id, cent.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, cent.c) / (e.nrm * cent.cnrm) DESC,
                            cent.cid ASC) AS rn
        FROM e CROSS JOIN cent
    ),
    corpus_cell AS (SELECT vec_id, cid FROM ranked_cells WHERE rn = 1),
    anchors(query_id, avid) AS (SELECT * FROM (VALUES {a_values})),
    q_cells AS (
        SELECT a.query_id, a.avid, rc.cid
        FROM anchors a JOIN ranked_cells rc ON rc.vec_id = a.avid AND rc.rn <= 2
    ),
    dense_scored AS (
        SELECT q.query_id, c.vec_id AS doc_id,
               round(list_dot_product(qe.v, ce.v) / (qe.nrm * ce.nrm), 6) AS cosine
        FROM q_cells q
        JOIN corpus_cell c ON q.cid = c.cid AND c.vec_id <> q.avid
        JOIN e qe ON qe.vec_id = q.avid
        JOIN e ce ON ce.vec_id = c.vec_id
    ),
    dense_ranked AS (
        SELECT query_id, doc_id, rank_d FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS rank_d
            FROM dense_scored
        ) WHERE rank_d <= {_RRF_POOL}
    ),
    sparse_ranked AS (
        SELECT query_id, doc_id, rank_s FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank_s
            FROM scored
        ) WHERE rank_s <= {_RRF_POOL}
    ),
    fused AS (
        SELECT coalesce(s.query_id, d.query_id) AS query_id,
               coalesce(s.doc_id, d.doc_id) AS doc_id,
               round(coalesce(1.0 / ({_RRF_K} + s.rank_s), 0)
                     + coalesce(1.0 / ({_RRF_K} + d.rank_d), 0), 6) AS rrf_score,
               CAST(coalesce(s.rank_s, 0) AS INT) AS sparse_rank,
               CAST(coalesce(d.rank_d, 0) AS INT) AS dense_rank
        FROM sparse_ranked s
        FULL OUTER JOIN dense_ranked d
          ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rn AS INT) AS fused_rank,
           sparse_rank, dense_rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS rn
        FROM fused
    ) WHERE rn <= {_RRF_TOPK}
    """


@register(
    "retrieval_hybrid_rrf_served",
    oracle=_rrf_served_oracle(),
    doc="Hybrid retrieval SERVED ENTIRELY FROM STORED INDEXES — the "
    "production twin of retrieval_hybrid_rrf, whose sparse half "
    "recomputed tf/df from the corpus per query: the nightly job "
    "MERGEs the arriving batch (id % 5 = 0) into BOTH index halves — "
    "batch postings into the (segment, term-bucket)-partitioned BM25 "
    "inverted file, batch vector assignments (computed with the "
    "STORED fixed centroids, never retrained) into the "
    "cid-partitioned self-contained IVF inverted file — and serving "
    "reads only what the queries touch: the query terms' posting "
    "buckets and the anchors' 2 probed cells per query, both pruned "
    "AT THE MANIFEST. Fusion is the same pool-bounded reciprocal-rank "
    "full outer join (1/(60+rank), top-5). The dense half pays the "
    "standard IVF recall trade vs the brute-force twin (an unprobed "
    "cell's neighbor is missed) — the oracle replays the fixed-"
    "centroid assignment, probing, in-cell cosine, and fusion "
    "exactly, so the hash pins both index lifecycles end to end.",
)
def retrieval_hybrid_rrf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    embs = read_testdata(spark, sf_dir, "embeddings")
    sroot = _bm25_index_root(spark, docs, "bm25hyb")
    droot = _hybrid_dense_index_root(spark, embs, "hyb_ivf")
    return hybrid_rrf_served_from_roots(spark, sroot, droot, embs)


def _hybrid_dense_index_root(spark: SparkSession, embs: DataFrame, name: str) -> str:
    """The dense half's nightly index maintenance: historic
    self-contained IVF inverted file + batch MERGE (assignments
    computed with the STORED fixed centroids, never retrained),
    cid-partitioned via the shared lifecycle module. Returns the table
    root; the scale probe builds this once per corpus size, untimed."""
    from ..llm.similarity import ivf_cell_assignments
    from ..sinks.indexes import IncrementalIndexStore, fresh_index_root
    from .llm import _IVF_FIXED_CENTROIDS

    cents = _IVF_FIXED_CENTROIDS
    droot = fresh_index_root(name)
    hist = embs.where(F.col("vec_id") % 5 != 0)
    batch = embs.where(F.col("vec_id") % 5 == 0)
    dstore = IncrementalIndexStore(
        spark, f"{droot}/cells", keys=["vec_id"], partition_by=["cid"]
    ).build(ivf_cell_assignments(hist, centroids=cents, carry_vectors=True))
    dstore.merge(ivf_cell_assignments(batch, centroids=cents, carry_vectors=True))
    return droot


def hybrid_rrf_served_from_roots(
    spark: SparkSession, sroot: str, droot: str, embs: DataFrame
) -> DataFrame:
    """The SERVING half of retrieval_hybrid_rrf_served, over prebuilt
    index roots — split out (r11 verdict ask #3) so the scale probe
    can time the composed serve alone while both stored indexes scale:
    the query terms' posting buckets and the anchors' probed cells are
    both pruned AT THE MANIFEST, so the only corpus-shaped input ever
    touched is the 10-row anchor-vector read (id-pushdown on the
    embeddings scan). Fusion stays the pool-bounded full-outer RRF."""
    from ..llm.similarity import ivf_probed_cells, ivf_topk_from_inverted_file
    from ..sinks.indexes import IncrementalIndexStore
    from .llm import _IVF_FIXED_CENTROIDS

    sparse_ranked = top_n_per_group(
        _bm25_scores_served(spark, sroot),
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        n=_RRF_POOL,
        rank_col="rank_s",
        keep_rank=True,
    ).select("query_id", "doc_id", "rank_s")

    cents = _IVF_FIXED_CENTROIDS
    anchors = spark.createDataFrame(_RRF_ANCHORS, "query_id string, avid bigint")
    qvecs = embs.where(F.col("vec_id").isin([v for _, v in _RRF_ANCHORS]))
    cells = ivf_probed_cells(qvecs, centroids=cents, n_probe=2)
    inv = IncrementalIndexStore(
        spark, f"{droot}/cells", keys=["vec_id"], partition_by=["cid"]
    ).serve({"cid": cells})
    dense_pool = ivf_topk_from_inverted_file(
        inv, qvecs, centroids=cents, k=_RRF_POOL, n_probe=2
    )
    dense_ranked = (
        top_n_per_group(
            dense_pool.withColumnRenamed("query_id", "avid"),
            ["avid"],
            [F.col("cosine").desc(), F.col("neighbor_id").asc()],
            n=_RRF_POOL,
            rank_col="rank_d",
            keep_rank=True,
        )
        .join(F.broadcast(anchors), "avid")
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank_d")
    )
    return rrf_fuse(sparse_ranked, dense_ranked, k=_RRF_TOPK, rrf_k=_RRF_K)
