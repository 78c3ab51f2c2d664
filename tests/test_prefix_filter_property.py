"""Property test: the prefix-filtered EXACT Jaccard join returns the
same row set as the unfiltered all-candidates formulation on random
corpora and random thresholds — the SSJoin losslessness guarantee,
including the two boundary traps the r3 review caught (double-precision
ceil overshooting exact products; the round(J,4) output filter admitting
true Jaccard slightly below the nominal threshold)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import (
    jaccard_prefix_filtered_pairs,
    ngram_jaccard_pairs,
)

# small shared vocabulary so random docs actually overlap; doc length
# >= 3 so every doc has at least one 3-shingle
_WORDS = [f"w{i}" for i in range(12)]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(3, 12))
        toks = draw(
            st.lists(st.sampled_from(_WORDS), min_size=n_tok, max_size=n_tok)
        )
        docs.append((i, " ".join(toks)))
    # thresholds chosen adversarially: values whose double products
    # overshoot exact ceils (0.28, 0.14, 0.56) plus common settings
    t = draw(st.sampled_from([0.1, 0.14, 0.25, 0.28, 0.5, 0.56, 0.75, 0.8]))
    return docs, t


@pytest.mark.slow
@given(case=corpus())
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_prefix_filter_lossless_on_random_corpora(spark, case):
    docs, t = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = {tuple(r) for r in ngram_jaccard_pairs(df, k=3, threshold=t).collect()}
    pref = {
        tuple(r)
        for r in jaccard_prefix_filtered_pairs(df, k=3, threshold=t).collect()
    }
    assert pref == full
