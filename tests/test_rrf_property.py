"""Property test: the Spark reciprocal-rank-fusion operator agrees
with a direct Python RRF on random per-query rank pools — arbitrary
pool overlap, single-system hits, rank gaps, and tie doc_ids across
queries. The fixture-based oracle pins one data shape; this pins the
fusion algebra itself."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import rrf_fuse


def _pool(draw, qids):
    """Random (query_id, doc_id) -> rank pools: ranks form a prefix
    1..n per query (what any top-n ranker emits)."""
    out = []
    for q in qids:
        docs = draw(
            st.lists(st.integers(0, 15), min_size=0, max_size=8, unique=True)
        )
        out += [(q, d, r + 1) for r, d in enumerate(docs)]
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data(), k=st.integers(1, 6), rrf_k=st.sampled_from([10, 60]))
def test_rrf_fuse_matches_python_reference(spark, data, k, rrf_k):
    qids = ["qa", "qb"]
    sparse = _pool(data.draw, qids)
    dense = _pool(data.draw, qids)
    s_df = spark.createDataFrame(
        sparse or [("__none__", -1, 1)], "query_id string, doc_id long, rank_s int"
    )
    d_df = spark.createDataFrame(
        dense or [("__none__", -1, 1)], "query_id string, doc_id long, rank_d int"
    )
    out = rrf_fuse(s_df, d_df, k=k, rrf_k=rrf_k).collect()

    s_map = {(q, d): r for q, d, r in sparse} or {("__none__", -1): 1}
    d_map = {(q, d): r for q, d, r in dense} or {("__none__", -1): 1}
    expect = {}
    for q, d in set(s_map) | set(d_map):
        score = 0.0
        if (q, d) in s_map:
            score += 1.0 / (rrf_k + s_map[(q, d)])
        if (q, d) in d_map:
            score += 1.0 / (rrf_k + d_map[(q, d)])
        expect.setdefault(q, []).append((round(score, 6), d))
    rows = {}
    for q, cands in expect.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        for pos, (score, d) in enumerate(cands[:k], start=1):
            rows[(q, d)] = (score, pos)

    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.fused_rank, r.sparse_rank, r.dense_rank)
        for r in out
    }
    assert set(got) == set(rows)
    for key, (score, pos) in rows.items():
        g_score, g_pos, g_rs, g_rd = got[key]
        assert g_score == score and g_pos == pos
        assert g_rs == s_map.get(key, 0) and g_rd == d_map.get(key, 0)
