"""Text-analysis column builders — pure Spark expressions, no UDFs.

Everything here stays inside whole-stage codegen (higher-order array
functions run JVM-side), so these scale linearly with input bytes and
never cross the Python boundary.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens of the trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WHITESPACE)


def shingles(tokens: Column, k: int = 3, sep: str = " ") -> Column:
    """Word k-gram shingles as an array<string>; empty array when the
    document has fewer than k tokens (guards Spark's descending
    ``sequence`` when start > stop)."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, F.lit(k)), sep))
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the lower-cased, whitespace-collapsed
    text. Identical normalization on any engine -> joinable dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), WHITESPACE, " "))


def text_stats(text: Column | str) -> dict[str, Column]:
    """Quality-scoring columns: char/token counts, average token length,
    type-token ratio. Ratios rounded to 4 decimals (stable across
    engines)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tokens,
        "n_uniq_tokens": n_uniq,
        "avg_token_len": F.round(sum_len * F.lit(1.0) / n_tokens, 4),
        "type_token_ratio": F.round(n_uniq * F.lit(1.0) / n_tokens, 4),
    }


def repetition_stats(text: Column | str) -> dict[str, Column]:
    """Gopher-style repetition-quality signals, computed map-only.

    - ``dup_token_frac`` — fraction of tokens that repeat an earlier one
      (1 - distinct/total);
    - ``top_bigram_count`` / ``top_bigram_frac`` — occurrences of the
      single most frequent word bigram, absolute and as a fraction of
      all bigrams. High values mark boilerplate / degenerate repetition
      (the Gopher repetition filters).

    The top-bigram mode is found WITHOUT a shuffle: sort the bigram
    array, then a single ``aggregate`` pass tracks the longest run of
    equal adjacent values — O(n log n) per row, JVM-side, so the whole
    operator stays embarrassingly parallel at corpus scale (the
    explode-and-count alternative shuffles one row per bigram
    occurrence)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    bigrams = shingles(toks, k=2)
    n_bigrams = F.size(bigrams)

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )
    return {
        "n_tokens": n_tokens,
        "dup_token_frac": F.round((n_tokens - n_uniq) * F.lit(1.0) / n_tokens, 4),
        "top_bigram_count": top,
        "top_bigram_frac": F.when(
            n_bigrams > 0, F.round(top * F.lit(1.0) / n_bigrams, 4)
        ).otherwise(F.lit(0.0)),
    }


def contamination_counts(
    train: "DataFrame",
    eval_df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> "DataFrame":
    """Benchmark decontamination: for every training document, count how
    many of its distinct word-``k``-grams also occur anywhere in the
    evaluation set. Returns ``(id, n_matched_ngrams, contaminated)`` for
    every training row.

    The eval shingle set is broadcast — benchmark suites are tiny next
    to a training corpus, so the overlap join is map-side and the only
    shuffle is the per-doc count. If the eval side ever outgrows the
    broadcast threshold, drop the hint and let AQE pick the join."""
    train_sh = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokenize(F.col(text_col)), k=k))).alias("__shingle"),
    )
    eval_sh = (
        eval_df.select(
            F.explode(F.array_distinct(shingles(tokenize(F.col(text_col)), k=k))).alias("__shingle")
        )
        .where(F.col("__shingle") != "")
        .distinct()
    )
    matched = (
        train_sh.join(F.broadcast(eval_sh), "__shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        train.select(id_col)
        .join(matched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias("n_matched_ngrams"),
            (F.coalesce(F.col("__n"), F.lit(0).cast("long")) > 0).alias("contaminated"),
        )
    )


DEFAULT_LANG_MARKERS: Mapping[str, Sequence[str]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "que", "los"),
    "fr": ("le", "et", "les"),
    "zh": ("的", "是"),
}


def lang_scores(
    text: Column | str, markers: Mapping[str, Sequence[str]] = DEFAULT_LANG_MARKERS
) -> dict[str, Column]:
    """n-gram-heuristic language ID: per-language stopword-token counts
    plus a ``pred_lang`` argmax (priority order breaks ties; 'unknown'
    when every score is zero)."""
    toks = tokenize(text)

    def any_of(t: Column, words: Sequence[str]) -> Column:
        # OR-chain instead of Column.isin: isin is not supported on
        # lambda variables inside higher-order functions
        cond = t == F.lit(words[0])
        for w in words[1:]:
            cond = cond | (t == F.lit(w))
        return cond

    def marker_pred(words: Sequence[str]):
        # single-arg closure: a 2-arg lambda would be treated by Spark as
        # the (element, index) form, binding the index Column to `words`
        return lambda t: any_of(t, words)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(words)))
        for lang, words in markers.items()
    }
    langs = list(scores)
    pred = F.lit("unknown")
    # build from lowest priority up so earlier langs win ties
    for lang in reversed(langs):
        others = [scores[o] for o in langs if o != lang]
        ge_all = F.lit(True)
        for o in others:
            ge_all = ge_all & (scores[lang] >= o)
        pred = F.when((scores[lang] > 0) & ge_all, F.lit(lang)).otherwise(pred)
    out = {f"score_{lang}": c for lang, c in scores.items()}
    out["pred_lang"] = pred
    return out


# --------------------------------------------------------------------------
# PII redaction, chunking, boilerplate scoring (corpus-cleaning operators)
# --------------------------------------------------------------------------

# Patterns restricted to syntax RE2 (DuckDB) and java.util.regex (Spark)
# interpret identically, so oracles can mirror them verbatim. Order
# matters: emails contain digits, so they redact first.
PII_PATTERNS: Sequence[tuple[str, str]] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s()-]{7,}\d", "<PHONE>"),
)


def redact_pii(text: Column | str, patterns: Sequence[tuple[str, str]] = PII_PATTERNS) -> Column:
    """Replace every match of each (pattern, tag) pair — emails, IPv4s,
    phone-shaped digit runs by default. Pure ``regexp_replace`` chain:
    JVM-side, codegen'd, linear in bytes."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, tag in patterns:
        c = F.regexp_replace(c, pat, tag)
    return c


def chunk_starts(tokens: Column, stride: int) -> Column:
    """1-based start offsets of fixed-stride chunks over a token array."""
    return F.sequence(F.lit(1), F.greatest(F.size(tokens), F.lit(1)), F.lit(stride))


def chunk_at(tokens: Column, start: Column, chunk_size: int, sep: str = " ") -> Column:
    """The chunk beginning at 1-based ``start``: ``chunk_size`` tokens
    (clamped at the document end), joined back to text."""
    return F.array_join(F.slice(tokens, start, chunk_size), sep)


def dsir_logratio(
    df: "DataFrame",
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 64,
    alpha: float = 1.0,
) -> "DataFrame":
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    ``log p_target(doc) / p_source(doc)`` under a hashed bag-of-ngrams
    model — unigrams plus bigrams, each occurrence hashed into one of
    ``n_buckets`` buckets; bucket probabilities are add-``alpha``
    estimates from the ``target``-flagged subset (the distribution you
    want more of) vs the whole corpus (the source you sample from).
    Positive weight = looks more like the target than the source. Feed
    the weights to a sampler (``sample_weighted_reservoir`` composes)
    to finish the resampling step.

    Scale shape: the corpus is scanned+exploded exactly TWICE — once to
    build the bucket aggregate (``n_buckets`` output rows; both target
    and source counts come out of that one pass via conditional sums,
    so the target subset is never scanned separately) and once to score
    — never three times: the bucket table is ``localCheckpoint``ed
    (model-sized, 64 rows) so the corpus totals derive from it instead
    of re-aggregating a third corpus scan (Spark's ReuseExchange does
    NOT canonicalize the two agg subtrees together — measured r5).
    The checkpointed bucket table broadcasts back onto the feature
    stream and a per-doc sum closes it out; nothing corpus-sized ever
    sits on a build side.

    Returns ``(id, n_feats, dsir_logratio)`` — the log ratio UNROUNDED;
    callers round for cross-engine comparison. Documents with zero
    features (empty text) are absent, like every tokenizer path here.
    """
    from ..functions.columns import md5_prefix_int
    from ..operators.partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)
    toks = tokenize(F.col(text_col))
    uni = F.filter(toks, lambda t: t != "")
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, F.lit(2)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            target.alias("__is_target"),
            F.explode(F.concat(uni, bi)).alias("__feat"),
        )
        .select(
            id_col,
            "__is_target",
            (md5_prefix_int("__feat").cast("bigint") % n_buckets).alias("__bucket"),
        )
    )
    buckets = feats.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__src_c"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__tgt_c"),
    ).localCheckpoint(eager=True)
    totals = buckets.agg(
        F.sum("__src_c").alias("__src_n"), F.sum("__tgt_c").alias("__tgt_n")
    )
    denom_b = F.lit(alpha) * n_buckets
    scored = (
        feats.join(F.broadcast(buckets), "__bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                F.log((F.col("__tgt_c") + F.lit(alpha)) / (F.col("__tgt_n") + denom_b))
                - F.log((F.col("__src_c") + F.lit(alpha)) / (F.col("__src_n") + denom_b))
            ).alias("__lr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.sum("__lr").alias("dsir_logratio"),
    )
