"""Unit tests for the graph/retrieval/Arrow battery
(workloads/graph_retrieval.py) — semantics the DuckDB oracle can't
isolate: containment vs Jaccard divergence, PageRank invariants,
Arrow UDF edge cases (zero vectors, null filtering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import (
    jaccard_prefix_filtered_pairs,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
    _normalize_arrow_batches,
    graph_pagerank_fixed,
    retrieval_bm25_topk,
)


def test_containment_catches_subset_jaccard_misses(spark):
    # doc 2 = doc 1's text embedded in a much longer page: containment
    # of 1-in-2 is 1.0 while Jaccard is far below any dedup threshold.
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame([(1, short), (2, long)], "doc_id long, text string")
    cont = ngram_containment_pairs(df, k=3, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.doc_a, row.doc_b) == (1, 2)
    assert row.cont_a_in_b == 1.0  # every shingle of the short doc is shared
    assert row.cont_b_in_a < 0.1
    jac = ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    assert jac == []  # Jaccard never reaches a dedup-grade threshold


def test_containment_symmetric_pair_shares_overlap_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(df, k=3, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.cont_a_in_b, r.cont_b_in_a) == (1, 2, 1.0, 1.0)


def test_prefix_filter_join_is_lossless(spark, sf_dir):
    # SSJoin guarantee: the prefix-filtered exact join returns the SAME
    # rows as the all-candidates formulation at the same threshold
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    full = {tuple(r) for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    pref = {
        tuple(r) for r in jaccard_prefix_filtered_pairs(docs, k=3, threshold=0.5).collect()
    }
    assert pref == full and len(full) > 0


def test_prefix_filter_prunes_candidates(spark):
    # two near-identical docs + many docs sharing only one hot shingle:
    # the hot shingle is frequency-ordered LAST, so it leaves every
    # prefix and the hot bucket generates zero candidate pairs
    hot = "common shared boiler plate"
    rows = [(1, "alpha beta gamma delta epsilon zeta " + hot),
            (2, "alpha beta gamma delta epsilon zeta eta " + hot)]
    rows += [(10 + i, f"u{i} v{i} w{i} x{i} y{i} z{i} " + hot) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_prefix_filtered_pairs(df, k=3, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]
    # sanity: the unfiltered candidate universe would include every
    # hot-bucket pair (22 docs -> 231 candidate pairs); the verified
    # output alone doesn't prove pruning, so check the prefix table
    # excludes the hot shingle entirely
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import _doc_shingles

    sh = _doc_shingles(df, "text", "doc_id", 3)
    n_hot_docs = sh.where(F.col("shingle").contains("common shared")).count()
    assert n_hot_docs >= 22  # the skew exists in the raw shingle table


def test_pagerank_mass_conserved_and_positive(spark, sf_dir):
    ranks = graph_pagerank_fixed(spark, sf_dir).collect()
    total = sum(r.rank for r in ranks)
    # with dangling-mass redistribution total rank stays ~1 (only the
    # per-round 1e-12 roundings drift it)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r.rank > 0 for r in ranks)


def test_pagerank_sinks_outrank_uniform(spark, sf_dir):
    # suppliers only RECEIVE mass, so every supplier node should sit
    # above the uniform 1/N floor and customers at/below their initial
    ranks = graph_pagerank_fixed(spark, sf_dir)
    n = ranks.count()
    supp = ranks.where(F.col("node") >= 1_000_000_000)
    assert supp.where(F.col("rank") <= 1.0 / n).count() == 0


def test_bm25_scores_rank_term_frequency(spark, tmp_path):
    # build a tiny corpus parquet so the registered query runs on it
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (1, "spark join spark join spark", "en", "s", 5),
        (2, "spark filter scan table row", "en", "s", 5),
        (3, "window batch merge value key", "en", "s", 5),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
            "source": [d[3] for d in docs],
            "n_chars": pa.array([d[4] for d in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = retrieval_bm25_topk(spark, str(tmp_path)).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    sj = sorted(by_query["q_spark_join"], key=lambda r: r.rank)
    # doc 1 carries both terms with high tf -> must outrank doc 2
    assert sj[0].doc_id == 1 and sj[0].score > sj[1].score
    assert all(r.doc_id != 3 for r in sj)  # no query term, never scored


def test_normalize_arrow_zero_vector_yields_null_unit():
    import pyarrow as pa

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2], pa.int64()),
            pa.array([[0.0, 0.0], [3.0, 4.0]], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    out = list(_normalize_arrow_batches(iter([batch])))
    assert len(out) == 1
    rows = out[0].to_pylist()
    assert rows[0]["unit"] is None and rows[0]["norm"] == 0.0
    assert rows[1]["norm"] == 5.0
    assert rows[1]["unit"] == pytest.approx([0.6, 0.8])


def test_normalize_arrow_skips_empty_batches():
    import pyarrow as pa

    empty = pa.RecordBatch.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.list_(pa.float32()))],
        names=["vec_id", "embedding"],
    )
    assert list(_normalize_arrow_batches(iter([empty]))) == []


def test_normalize_arrow_rejects_ragged_vectors():
    import pyarrow as pa

    ragged = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2], pa.int64()),
            pa.array([[1.0, 2.0], [1.0]], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="fixed-width"):
        list(_normalize_arrow_batches(iter([ragged])))


def test_normalize_arrow_empty_vector_matches_sql_null_semantics():
    import pyarrow as pa

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2, 3], pa.int64()),
            pa.array([[], [3.0, 4.0], []], pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    out = list(_normalize_arrow_batches(iter([batch])))[0].to_pylist()
    # empty list -> unit=[] / norm=None, the oracle's sum-over-empty-is-NULL
    assert out[0]["unit"] == [] and out[0]["norm"] is None
    assert out[1]["norm"] == 5.0
    assert out[2]["unit"] == [] and out[2]["norm"] is None


def test_interval_merge_islands_on_crafted_case(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    # supplier 1: [1,4] [2,5] overlap -> island; [7,8] separate;
    # touching boundary [5,6] extends the first island (>= is overlap)
    rows = [
        (1, 1, dt.datetime(2024, 1, 1), 1),   # e = +3d  -> Jan 4
        (2, 1, dt.datetime(2024, 1, 2), 1),   # e = +3d  -> Jan 5
        (3, 1, dt.datetime(2024, 1, 5), 1),   # s = prior max end -> same island, e Jan 8
        (4, 1, dt.datetime(2024, 1, 20), 1),  # new island
    ]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([1] * 4, pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in rows], pa.int64()),
            "l_quantity": pa.array([1.0] * 4),
            "l_extendedprice": pa.array([1.0] * 4),
            "l_discount": pa.array([0.0] * 4),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet", coerce_timestamps="us")
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        intervals_merge_overlapping,
    )

    out = sorted(
        (r.island, r.cover_start, r.cover_end, r.n_intervals)
        for r in intervals_merge_overlapping(spark, str(tmp_path)).collect()
    )
    assert len(out) == 2
    assert out[0][1] == dt.datetime(2024, 1, 1) and out[0][2] == dt.datetime(2024, 1, 8)
    assert out[0][3] == 3  # three intervals merged into the first island
    assert out[1][3] == 1


def test_asof_nearest_ignores_null_timestamps(spark):
    # the review-caught trap: nearest's key-only join condition would
    # otherwise match null-ts rows, and a NULL delta sorts FIRST under
    # asc() — a null-ts right row would beat every real candidate
    import datetime as dt

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.asof import asof_join

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, "u", t), (2, "u", None)], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "u", None, "null-ts"), (11, "u", t.replace(hour=13), "real")],
        "event_id long, k string, ts timestamp, tag string",
    )
    out = {
        r.event_id: r.tag
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            direction="nearest", tiebreak="event_id", how="left", left_id="event_id",
        ).collect()
    }
    assert out[1] == "real"  # the null-ts right row never wins
    assert out[2] is None  # null-ts left rows keep a null payload


def test_asof_nearest_mixed_temporal_units(spark):
    # timestamp-left vs date-right used to compare unix MICROS against
    # unix DAYS — silently wrong nearest picks (r3 advisor finding).
    # Mixed timestamp/date now normalizes both sides to micros;
    # temporal-vs-numeric raises instead of comparing garbage.
    import datetime as dt

    import pytest as _pytest

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 10, 1, 0, 0))],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", dt.date(2024, 1, 10), "same-day"), ("u", dt.date(2024, 1, 12), "later")],
        "k string, d date, tag string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="d",
        direction="nearest", tiebreak="tag",
    ).collect()
    # 2024-01-10T01:00 is 1h from midnight Jan 10 and 47h from Jan 12:
    # under the broken micros-vs-days compare, day number 19732 beat it.
    assert out[0].tag == "same-day"

    num_right = spark.createDataFrame([("u", 5, "n")], "k string, v int, tag string")
    with _pytest.raises(ValueError, match="comparable timestamp units"):
        asof_join(
            left, num_right, on=["k"], left_ts="ts", right_ts="v",
            direction="nearest",
        )


def test_kcore_peel_cascades_one_chain_node_per_round(spark):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import kcore_peel

    # triangle (1,2,3) with a pendant chain 3-4-5: the 2-core is the
    # triangle alone, but node 4 only becomes peelable AFTER round 1
    # removes the chain tip 5 — the cascade the fixed rounds bound.
    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long")

    def nodes(df):
        return {r.src for r in df.select("src").distinct().collect()}

    assert nodes(kcore_peel(edges, 2, 0)) == {1, 2, 3, 4, 5}
    assert nodes(kcore_peel(edges, 2, 1)) == {1, 2, 3, 4}  # tip 5 gone
    assert nodes(kcore_peel(edges, 2, 2)) == {1, 2, 3}  # then 4 cascades
    assert nodes(kcore_peel(edges, 2, 3)) == {1, 2, 3}  # fixed point
    # k=3: the triangle (degree 2 everywhere) cannot survive
    assert nodes(kcore_peel(edges, 3, 1)) == set()


def test_kcore_peel_rejects_bad_parameters(spark):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore_peel(edges, 0, 1)
    with pytest.raises(ValueError):
        kcore_peel(edges, 2, -1)


def test_als_rank2_recovers_planted_factors(spark):
    # plant an exactly-rank-2 matrix r = p_u . q_i and check ALS drives
    # squared reconstruction error far below the init's — the learning
    # sanity the bit-exact oracle cannot express (it replays, not
    # evaluates). Small lambda -> near-exact recovery of the products.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        als_init_factors,
        als_solve_rank2,
    )

    p_true = {u: (1.0 + 0.3 * u, 0.5 + 0.2 * (u % 3)) for u in range(1, 7)}
    q_true = {i: (0.8 + 0.1 * i, 1.2 - 0.15 * (i % 4)) for i in range(1, 9)}
    data = [
        (u, i, p_true[u][0] * q_true[i][0] + p_true[u][1] * q_true[i][1])
        for u in p_true
        for i in q_true
    ]
    ratings = spark.createDataFrame(data, "u int, it int, r double")

    def sq_err(p_df, q_df):
        p = {r.k: (r.f1, r.f2) for r in p_df.collect()}
        q = {r.k: (r.f1, r.f2) for r in q_df.collect()}
        return sum(
            (p[u][0] * q[i][0] + p[u][1] * q[i][1] - r) ** 2 for u, i, r in data
        )

    q0 = als_init_factors(ratings, "it")
    p0 = als_init_factors(ratings, "u")
    err_init = sq_err(p0, q0)

    lam = 1e-6
    q = q0
    for _ in range(4):
        p = als_solve_rank2(ratings, q, "u", "it", lam=lam)
        q = als_solve_rank2(ratings, p, "it", "u", lam=lam)
    err_trained = sq_err(p, q)
    assert err_trained < err_init * 1e-3
    assert err_trained < 1e-4  # planted rank-2 structure is recoverable


def test_hybrid_rrf_fuses_rank_contributions(spark, tmp_path):
    # Engineered micro-corpus: doc 1 is rank 1 in BOTH systems for
    # q_spark_join (its text carries both query terms at high tf; its
    # embedding is near-parallel to the query anchor vec 0), so fusion
    # must sum both 1/(60+1) contributions; docs surfaced by a single
    # system carry exactly one term and a NULL rank for the other.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        retrieval_hybrid_rrf,
    )

    docs = [
        (1, "spark join spark join spark"),
        (2, "spark filter scan table row"),
        (3, "quiet corpus page nothing here"),
        (4, "spark once among filler words"),  # sparse-only: no embedding row
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": [d[1] for d in docs],
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": pa.array([5] * len(docs), pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # anchor: q_spark_join
        (1, [0.99, 0.1, 0.0, 0.0]),  # doc 1: dense rank 1 for q_spark_join
        (2, [0.0, 1.0, 0.0, 0.0]),  # anchor: q_vector_scan (orthogonal)
        (3, [0.9, 0.43, 0.0, 0.0]),  # dense-only hit, rank 2
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = retrieval_hybrid_rrf(spark, str(tmp_path)).collect()
    sj = {r.doc_id: r for r in out if r.query_id == "q_spark_join"}
    top = min(sj.values(), key=lambda r: r.fused_rank)
    assert top.doc_id == 1 and (top.sparse_rank, top.dense_rank) == (1, 1)
    assert top.rrf_score == pytest.approx(round(2.0 / 61.0, 6), abs=1e-9)
    # doc 2 sits in BOTH pools (every vector ranks in a 4-row corpus):
    # its fused score is the exact two-term sum
    assert sj[2].sparse_rank > 0 and sj[2].dense_rank > 0
    assert sj[2].rrf_score == pytest.approx(
        round(1.0 / (60 + sj[2].sparse_rank) + 1.0 / (60 + sj[2].dense_rank), 6),
        abs=1e-9,
    )
    # doc 4: sparse-only (text hit, embedding absent from the corpus);
    # rank 0 = "not surfaced by this system"
    assert sj[4].dense_rank == 0
    assert sj[4].rrf_score == pytest.approx(
        round(1.0 / (60 + sj[4].sparse_rank), 6), abs=1e-9
    )
    # vec 3: dense-only (no parquet doc text contains a query term)
    assert sj[3].sparse_rank == 0
    assert sj[3].rrf_score == pytest.approx(
        round(1.0 / (60 + sj[3].dense_rank), 6), abs=1e-9
    )
    # every fused list respects the (score DESC, doc_id ASC) total order
    for qid in {r.query_id for r in out}:
        rows = sorted((r for r in out if r.query_id == qid), key=lambda r: r.fused_rank)
        keys = [(-r.rrf_score, r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_ndcg_eval_bounds_and_system_coverage(spark, sf_dir):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        eval_retrieval_ndcg,
    )

    rows = eval_retrieval_ndcg(spark, sf_dir).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, {})[r.system] = r.ndcg
    # every query evaluates all three rankers, and nDCG is a proper
    # normalized metric: within [0, 1] (1 only if the top-k is ideal)
    for qid, systems in by_query.items():
        assert set(systems) == {"bm25", "dense", "hybrid"}
        for v in systems.values():
            assert 0.0 <= v <= 1.0


def test_bm25_index_merge_history_zero_io_and_bucket_pruning(spark, sf_dir):
    # the nightly posting MERGE writes only the BATCH segment's
    # partitions (the Lucene segment model): every historic (seg=0)
    # manifest entry must carry over byte-identical — at 100 TB this
    # is the difference between appending a segment and rewriting the
    # inverted file. And serving's partition_filter must prune the
    # manifest to exactly the query terms' buckets.
    import os
    import tempfile

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        _read_manifest,
        list_versions,
        read_versioned_table,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sources.readers import (
        read_testdata,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        _BM25_QUERIES,
        _BM25_TB,
        _bm25_index_root,
        _bm25_scores,
        _bm25_scores_served,
        _term_bucket_py,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    root = _bm25_index_root(spark, docs, "bm25_pytest")
    table = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bm25_pytest_{os.getpid()}", "postings"
    )

    versions = list_versions(spark, table)
    assert len(versions) == 2, "expected exactly create + merge versions"
    m0 = _read_manifest(spark, table, versions[0])
    m1 = _read_manifest(spark, table, versions[1])
    hist0 = sorted(
        (e["dir"] for e in m0["entries"] if e["partition"]["seg"] == 0)
    )
    hist1 = sorted(
        (e["dir"] for e in m1["entries"] if e["partition"]["seg"] == 0)
    )
    assert hist0 == hist1 and hist0, (
        "historic segment entries changed across the merge — the nightly "
        "job rewrote history instead of appending its own segment"
    )
    assert any(e["partition"]["seg"] == 1 for e in m1["entries"]), (
        "merge produced no batch-segment partitions"
    )

    # manifest-level pruning: the pruned read's plan must reference
    # only the query buckets' directories
    buckets = sorted({_term_bucket_py(t) for _, ts in _BM25_QUERIES for t in ts})
    assert len(buckets) < _BM25_TB, "fixture queries cover every bucket — vacuous"
    pruned = read_versioned_table(
        spark, table, partition_filter={"tb": buckets}
    )
    n_pruned = len(
        [e for e in m1["entries"] if e["partition"]["tb"] in buckets]
    )
    assert n_pruned < len(m1["entries"]), "pruning dropped nothing"
    # inputFiles() lists the exact files the pruned plan will open:
    # every file must live under a query-bucket partition dir, and
    # every query-bucket entry must contribute (dir path shape:
    # data/<commit>/seg=X/tb=Y)
    read_dirs = {"/".join(f.split("/")[-3:-1]) for f in pruned.inputFiles()}
    want_dirs = {
        "/".join(e["dir"].split("/")[-2:])
        for e in m1["entries"]
        if e["partition"]["tb"] in buckets
    }
    drop_dirs = {
        "/".join(e["dir"].split("/")[-2:])
        for e in m1["entries"]
        if e["partition"]["tb"] not in buckets
    }
    assert read_dirs == want_dirs, "pruned read opens the wrong partitions"
    assert not (read_dirs & drop_dirs), "pruned read opens unqueried buckets"

    # served scores equal the recompute twin's scores bit-for-bit
    got = sorted(map(tuple, _bm25_scores_served(spark, root).collect()))
    want = sorted(map(tuple, _bm25_scores(spark, sf_dir).collect()))
    assert got == want and got, "served BM25 diverged from the recompute twin"


def test_bm25_index_nightly_maintenance(spark, sf_dir, tmp_path):
    # segments accumulate nightly (the Lucene-segment cost of
    # append-only merges): OPTIMIZE must be layout-only — identical
    # served scores before and after — and VACUUM must reclaim
    # superseded commits while the latest version keeps serving.
    # Mirrors the signature-store and PQ-code-table lifecycle tests:
    # the THIRD index family completes the maintenance story.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        compact_versioned_table,
        list_versions,
        read_versioned_table,
        vacuum_versioned_table,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sources.readers import (
        read_testdata,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        _bm25_index_root,
        _bm25_scores_served,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    # fragment the partition dirs the way a multi-task COW rewrite
    # does at production scale (the signature-store test's trick)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "200")
    try:
        root = _bm25_index_root(spark, docs, "bm25_maint")
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    table = f"{root}/postings"
    assert len(list_versions(spark, table)) == 2  # create + merge

    def served():
        return sorted(map(tuple, _bm25_scores_served(spark, root).collect()))

    before = served()
    files_before = len(read_versioned_table(spark, table).inputFiles())
    assert compact_versioned_table(spark, table), "nothing compacted"
    after = served()
    files_after = len(read_versioned_table(spark, table).inputFiles())
    assert after == before and after, "compaction changed served BM25 scores"
    assert files_after < files_before, "compaction did not reduce files"
    removed = vacuum_versioned_table(spark, table, keep_last=1, min_age_seconds=0)
    assert removed, "vacuum reclaimed nothing"
    assert served() == before, "vacuum broke the latest version"
