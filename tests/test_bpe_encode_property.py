"""bpe_encode_expr (the JVM replace-chain encode) must agree with a
reference Python BPE encoder on arbitrary words — both the sequential
rank-order formulation it implements, and (for tables produced the way
bpe_train produces them) the iterative lowest-rank-first formulation
HuggingFace/subword-nmt use, which is equivalent for such tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.tokenizer import (
    DEFAULT_MERGES,
    bpe_encode_expr,
    bpe_pieces_expr,
)


def _merge_once(seq: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping (a, b) -> a+b pass."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _encode_sequential(word: str, merges) -> list[str]:
    seq = list(word)
    for a, b in merges:
        seq = _merge_once(seq, a, b)
    return seq


def _encode_lowest_rank(word: str, merges) -> list[str]:
    """Iterative formulation: repeatedly apply the lowest-rank pair
    present anywhere in the sequence until none matches."""
    rank = {pair: i for i, pair in enumerate(merges)}
    seq = list(word)
    while len(seq) >= 2:
        best = min(
            (rank.get((seq[i], seq[i + 1]), len(merges)) for i in range(len(seq) - 1)),
            default=len(merges),
        )
        if best >= len(merges):
            return seq
        a, b = merges[best]
        seq = _merge_once(seq, a, b)
    return seq


def _spark_encode(spark, words: list[str]) -> dict[str, list[str]]:
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select(
        "w", bpe_pieces_expr(bpe_encode_expr(F.col("w"))).alias("p")
    ).collect()
    return {r.w: list(r.p) for r in rows}


# letters that actually participate in DEFAULT_MERGES, plus bystanders
_ALPHABET = "theinandorsgu" + "xz"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.text(alphabet=_ALPHABET, min_size=1, max_size=12),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_replace_chain_matches_reference_encoders(spark, words):
    got = _spark_encode(spark, words)
    for w in words:
        assert got[w] == _encode_sequential(w, DEFAULT_MERGES), w
        # DEFAULT_MERGES is training-shaped (each merge's constituents
        # predate it, no duplicate symbol strings), so the iterative
        # lowest-rank encode must coincide too
        assert got[w] == _encode_lowest_rank(w, DEFAULT_MERGES), w


def test_encode_chains_multi_level_merges(spark):
    got = _spark_encode(spark, ["the", "then", "anding", "resting", "aaa"])
    assert got["the"] == ["the"]  # t+h -> th, th+e -> the
    assert got["then"] == ["the", "n"]
    assert got["anding"] == ["and", "ing"]
    assert got["resting"] == ["re", "st", "ing"]
    assert got["aaa"] == ["a", "a", "a"]  # no (a, a) merge in the table
