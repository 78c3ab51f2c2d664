"""Greedy longest-match subword tokenization (WordPiece-style).

The training-pipeline token-accounting op: given a fixed subword
vocabulary (trained offline — here passed in as literals, the same
production shape as the IVF centroids and LSH hyperplanes), encode
each whitespace word by repeatedly taking the LONGEST vocab piece that
prefixes the remaining string; a position no piece matches emits one
``<unk>`` and advances one character. This is the serving half of
WordPiece/BPE (the merge-table walk), which is what corpus token
counting, cost estimation, and sequence packing actually need; the
TRAINING half (producing the merge table from corpus statistics) is
:func:`bpe_train` below — its pair counting is the genuinely
distributed part.

Determinism: the match rule (longest piece, lexicographic tiebreak) is
pure string logic, so an oracle engine can replay it exactly with a
recursive CTE over the same literal vocab.

Scale shape: tokenization crosses the Python boundary once per Arrow
batch (pandas UDF) with a per-batch word memo — each distinct word is
encoded once per batch, not once per occurrence. The JVM side computes
the whitespace split; only the token arrays cross to Python.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize

# Offline-trained stand-in vocabulary: frequent corpus words + the
# latin alphabet as byte-fallback pieces. Anything else (digits,
# punctuation, non-latin scripts) hits the <unk> path.
DEFAULT_VOCAB: tuple[str, ...] = (
    "table", "value", "spark", "batch", "merge", "window",
    "scan", "part", "hash", "fast", "slow", "sort", "line",
    "key", "agg", "row", "the",
) + tuple("abcdefghijklmnopqrstuvwxyz")


def _encoder(vocab: Sequence[str]):
    """word -> (n_pieces, n_unk) under greedy longest-match; pieces are
    bucketed by first char and sorted (len desc, lexicographic) so the
    first prefix hit IS the match the oracle's ORDER BY picks."""
    by_first: dict[str, list[str]] = {}
    for p in vocab:
        if not p:
            raise ValueError("vocab pieces must be non-empty")
        by_first.setdefault(p[0], []).append(p)
    for lst in by_first.values():
        lst.sort(key=lambda s: (-len(s), s))

    def encode_word(w: str) -> tuple[int, int]:
        n_pieces = n_unk = 0
        i = 0
        while i < len(w):
            best = None
            for p in by_first.get(w[i], ()):
                if w.startswith(p, i):
                    best = p
                    break
            n_pieces += 1
            if best is None:
                n_unk += 1
                i += 1
            else:
                i += len(best)
        return n_pieces, n_unk

    return encode_word


def subword_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    vocab: Sequence[str] = DEFAULT_VOCAB,
) -> DataFrame:
    """Per-document subword token accounting under greedy longest-match
    encoding with ``vocab``: whitespace-word count, emitted piece
    count, ``<unk>`` count, and pieces-per-word ratio (the fertility
    metric tokenizer evaluations report).

    Returns (id, n_tokens, n_pieces, n_unk, pieces_per_token).
    """
    vocab = tuple(vocab)

    @F.pandas_udf("struct<n_tokens: long, n_pieces: long, n_unk: long>")
    def enc(token_arrays: pd.Series) -> pd.DataFrame:
        encode_word = _encoder(vocab)
        memo: dict[str, tuple[int, int]] = {}
        rows = []
        for words in token_arrays:
            if words is None:
                rows.append((0, 0, 0))
                continue
            n_t = n_p = n_u = 0
            for w in words:
                if w == "":
                    continue
                hit = memo.get(w)
                if hit is None:
                    hit = memo[w] = encode_word(w)
                n_t += 1
                n_p += hit[0]
                n_u += hit[1]
            rows.append((n_t, n_p, n_u))
        return pd.DataFrame(rows, columns=["n_tokens", "n_pieces", "n_unk"])

    c: Column = enc(tokenize(F.col(text_col)))
    out = df.select(F.col(id_col), c.alias("__e"))
    return out.select(
        id_col,
        F.col("__e.n_tokens").alias("n_tokens"),
        F.col("__e.n_pieces").alias("n_pieces"),
        F.col("__e.n_unk").alias("n_unk"),
        F.when(
            F.col("__e.n_tokens") > 0,
            F.round(F.col("__e.n_pieces") / F.col("__e.n_tokens"), 4),
        ).alias("pieces_per_token"),
    )


# --------------------------------------------------------------------------
# BPE TRAINING (r4): the corpus-statistics half, distributed
# --------------------------------------------------------------------------
#
# The serving half above walks a fixed merge table; training PRODUCES
# that table. The expensive part of BPE training is corpus statistics —
# adjacent-symbol pair counts over the whole corpus — and that is
# exactly the part Spark should own. The classic algorithm (Sennrich et
# al. 2016, "Neural Machine Translation of Rare Words with Subword
# Units") runs on the WORD-TYPE table, not the token stream: dedupe the
# corpus to (word, freq) first — a Heaps'-law contraction, vocabulary
# grows ~sqrt(corpus) — then each merge round needs only
#   pair counts  = one explode + groupBy(sum) over word TYPES
#   best pair    = a 1-row TakeOrdered collect (model, not data)
#   apply merge  = a per-word-type rewrite (Arrow-batched pandas UDF)
# with a localCheckpoint per round to truncate the iterative lineage
# (the same pattern as graph_pagerank_fixed).


def _pair_stats(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over ``(s: array<string>, n)``:
    every i -> (s[i], s[i+1]) weighted by n. Overlapping occurrences
    all count ('aaa' contributes (a,a) twice), matching the reference
    algorithm's get_stats."""
    pair = F.explode(
        F.expr(
            "transform(sequence(1, size(s) - 1), "
            "i -> struct(element_at(s, i) AS lft, element_at(s, i + 1) AS rgt))"
        )
    ).alias("p")
    return (
        syms.where(F.size("s") >= 2)
        .select(pair, "n")
        .groupBy("p.lft", "p.rgt")
        .agg(F.sum("n").alias("pair_n"))
    )


def _merge_applier(a: str, b: str):
    """Greedy left-to-right non-overlapping (a, b) -> a+b rewrite of a
    symbol sequence — the reference algorithm's merge step."""

    @F.pandas_udf("array<string>")
    def apply_merge(col: pd.Series) -> pd.Series:
        def rewrite(seq):
            out, i, m = [], 0, len(seq)
            while i < m:
                if i + 1 < m and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return col.apply(rewrite)

    return apply_merge


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 10,
    min_pair_count: int = 2,
) -> list[dict]:
    """Train a BPE merge table on a text column; returns the learned
    merges as ``[{rank, left, right, pair_count}, ...]`` (the MODEL —
    a merge table is a few thousand rows at production vocab sizes, so
    it comes back to the driver like the IVF centroids do).

    Ties break (count desc, left asc, right asc) so training is
    deterministic — same corpus, same table, any cluster layout."""
    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = words.select(F.split(F.col("w"), "").alias("s"), "n").localCheckpoint(
        eager=True
    )
    merges: list[dict] = []
    for rank in range(num_merges):
        best = (
            _pair_stats(syms)
            .orderBy(F.col("pair_n").desc(), F.col("lft").asc(), F.col("rgt").asc())
            .limit(1)  # TakeOrderedAndProject: per-partition top-1, 1-row reduce
            .collect()
        )
        if not best or best[0]["pair_n"] < min_pair_count:
            break
        a, b, n = best[0]["lft"], best[0]["rgt"], int(best[0]["pair_n"])
        merges.append({"rank": rank, "left": a, "right": b, "pair_count": n})
        syms = syms.withColumn("s", _merge_applier(a, b)(F.col("s"))).localCheckpoint(
            eager=True
        )
    return merges


# --------------------------------------------------------------------------
# UNIGRAM-LM TRAINING (r9): the SentencePiece-style third trainer
# --------------------------------------------------------------------------
#
# Completes the tokenizer family (BPE train/encode, WordPiece greedy
# encode): a unigram language model over subword pieces (Kudo 2018,
# "Subword Regularization"), trained by hard (Viterbi) EM over the
# word-TYPE table — the documented Viterbi approximation of
# SentencePiece's full EM, chosen because every statistic it produces
# is an INTEGER (segment counts weighted by word frequency), which
# makes the trained model bit-replayable by a SQL oracle with the
# iterations unrolled (the Lloyd/ALS/BPE precedent). The distributed
# parts are exactly the corpus-shaped ones: word-type stats, seed
# substring counts, and the per-word Viterbi pass (Arrow-batched);
# only the piece-probability table (the model) crosses the driver
# between iterations, like bpe_train's best-pair collect.
#
# Determinism contract (shared with the oracle, which unrolls the DP
# positions as lateral-alias columns and walks backpointers with a
# bounded recursive CTE): piece probabilities are exact integer
# divisions in IEEE double (identical in any engine); Viterbi scores
# are products of those doubles in a fixed association order (DP
# position ascending), so they are bit-identical; the argmax tiebreak
# is (score, piece length) lexicographic — max score, then LONGEST
# piece.


def _viterbi_segment(
    w: str, probs: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``w`` under a unigram piece model: DP over
    end positions; candidate (score, l) pairs compared as tuples so
    ties prefer the longer piece — the exact comparison the oracle's
    ``list_max`` over {'v', 'l'} structs performs."""
    m = len(w)
    best = [0.0] * (m + 1)
    best[0] = 1.0
    back = [0] * (m + 1)
    for i in range(1, m + 1):
        bv, bl = -1.0, 0
        for l in range(1, min(max_piece_len, i) + 1):
            cand = best[i - l] * probs.get(w[i - l : i], 0.0)
            if cand > bv or (cand == bv and l > bl):
                bv, bl = cand, l
        best[i], back[i] = bv, bl
    pieces = []
    i = m
    while i > 0:
        l = back[i]
        pieces.append(w[i - l : i])
        i -= l
    return pieces


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_word_len: int = 16,
    max_piece_len: int = 4,
    min_seed_count: int = 2,
    iters: int = 2,
) -> DataFrame:
    """Train a unigram-LM subword vocabulary; returns the final
    ``(piece, piece_count)`` table (pieces used by at least one word's
    Viterbi segmentation in the last E step, with their corpus-weighted
    segment counts — the integer sufficient statistics of the model;
    probabilities are ``piece_count / sum(piece_count)``).

    Seed vocabulary: every substring of length <= ``max_piece_len``
    over the word-type table with corpus-weighted occurrence count >=
    ``min_seed_count``, plus ALL single characters (so every word
    stays segmentable). Each EM iteration Viterbi-segments every word
    type under the previous probabilities and re-counts; pieces no
    segmentation uses drop out. Words longer than ``max_word_len``
    are excluded from the statistics (the bound that lets the oracle
    unroll the DP; production vocab training caps word length the
    same way — SentencePiece's own trainer truncates long "sentences").

    Scale shape: word-type contraction first (Heaps' law — vocabulary
    grows ~sqrt(corpus)); seed counting is one explode + sum over word
    TYPES; each E step is one Arrow-batched pass over word types plus
    a piece-keyed sum with map-side combine. The model (piece probs)
    is collected per iteration like the IVF centroids / BPE merge
    table — never the data."""
    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .where((F.col("w") != "") & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # reused by seed pass + every E step
    )

    def _sub_expr(l: int):
        def f(i):
            return F.col("w").substr(i, F.lit(l))

        return f

    parts = []
    for l in range(1, max_piece_len + 1):
        idx = F.sequence(F.lit(1), F.length("w") - (l - 1))
        parts.append(
            F.when(F.length("w") >= l, F.transform(idx, _sub_expr(l))).otherwise(
                F.array().cast("array<string>")
            )
        )
    seeds = (
        words.select(F.explode(F.concat(*parts)).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        .where((F.col("cnt") >= min_seed_count) | (F.length("piece") == 1))
        .collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in seeds}

    def _e_step(probs: dict[str, float]) -> DataFrame:
        def gen(batches):
            import pandas as pd

            for pdf in batches:
                out_p: list[str] = []
                out_n: list[int] = []
                for w, n in zip(pdf["w"], pdf["n"]):
                    for piece in _viterbi_segment(w, probs, max_piece_len):
                        out_p.append(piece)
                        out_n.append(int(n))
                yield pd.DataFrame({"piece": out_p, "n": out_n})

        return (
            words.mapInPandas(gen, "piece string, n long")
            .groupBy("piece")
            .agg(F.sum("n").cast("bigint").alias("piece_count"))
        )

    out = None
    for it in range(iters):
        total = sum(counts.values())
        probs = {p: c / total for p, c in counts.items()}
        out = _e_step(probs)
        if it < iters - 1:
            counts = {r["piece"]: int(r["piece_count"]) for r in out.collect()}
    return out


def unigram_train_pruned(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_word_len: int = 16,
    max_piece_len: int = 4,
    min_seed_count: int = 2,
    iters: int = 2,
    prune_denom: int = 5,
) -> DataFrame:
    """:func:`unigram_train` plus SentencePiece's vocabulary-PRUNING
    schedule (Kudo 2018 §3.2 — the step the plain hard-EM trainer
    skips): after each E step the bottom ``1/prune_denom`` of
    MULTI-char pieces by loss-if-removed are dropped, and single-char
    pieces are never pruned (coverability). Returns the final pruned
    ``(piece, piece_count)`` model table.

    Loss proxy: under Viterbi counts the likelihood contribution of
    piece x is c(x)*ln(p(x)) with p = c/total, so loss-if-removed
    ~ c*ln(total/c), which is STRICTLY INCREASING in c on
    [1, total/e] (always the regime here) — the count ordering IS the
    loss ordering, so the prune is an integer rank filter over the
    count table (cnt ASC, piece ASC tiebreak; drop rn <= m div
    prune_denom), exactly replayable in SQL with no transcendental
    functions near the hash.

    Character floor: every single char from the seed universe stays in
    the model with count >= 1 (``greatest(viterbi_count, 1)`` — a
    Laplace-style floor). This keeps the load-bearing oracle invariant
    (see the d_0 INNER-join note in workloads/llm.py): every word
    always retains a positive-probability all-chars segmentation, so
    no word ever drops from the oracle's piece-map join and the DP
    never enters the all-zero-score regime where the l>i candidate
    asymmetry could desync the engines.

    The prune + floor is computed IN SPARK over the E-step output (a
    vocab-sized single-partition window — model-sized by Heaps'
    contraction, like the BPE merge table); only the resulting model
    crosses the driver between iterations, as in the base trainer."""
    from pyspark.sql import Window

    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .where((F.col("w") != "") & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )

    def _sub_expr(l: int):
        def f(i):
            return F.col("w").substr(i, F.lit(l))

        return f

    parts = []
    for l in range(1, max_piece_len + 1):
        idx = F.sequence(F.lit(1), F.length("w") - (l - 1))
        parts.append(
            F.when(F.length("w") >= l, F.transform(idx, _sub_expr(l))).otherwise(
                F.array().cast("array<string>")
            )
        )
    seeds = (
        words.select(F.explode(F.concat(*parts)).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        .where((F.col("cnt") >= min_seed_count) | (F.length("piece") == 1))
        .collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in seeds}
    chars = sorted(p for p in counts if len(p) == 1)
    spark = df.sparkSession
    chars_df = spark.createDataFrame([(c,) for c in chars], "piece string")

    def _e_step(probs: dict[str, float]) -> DataFrame:
        def gen(batches):
            import pandas as pd

            for pdf in batches:
                out_p: list[str] = []
                out_n: list[int] = []
                for w, n in zip(pdf["w"], pdf["n"]):
                    for piece in _viterbi_segment(w, probs, max_piece_len):
                        out_p.append(piece)
                        out_n.append(int(n))
                yield pd.DataFrame({"piece": out_p, "n": out_n})

        return (
            words.mapInPandas(gen, "piece string, n long")
            .groupBy("piece")
            .agg(F.sum("n").cast("bigint").alias("piece_count"))
        )

    def _prune_floor(estep_out: DataFrame) -> DataFrame:
        # merge pin: the E-step aggregate inherits the word-type
        # checkpoint's underestimate, and a LEFT join preserving the
        # tiny char side can only broadcast the RIGHT (vocab) side —
        # the non-demotable estimate-driven broadcast class the hazard
        # sweep flags. SMJ of two model-sized tables costs nothing.
        floored = chars_df.join(estep_out.hint("merge"), "piece", "left").select(
            "piece",
            F.greatest(F.coalesce("piece_count", F.lit(0)), F.lit(1))
            .cast("bigint")
            .alias("piece_count"),
        )
        w = Window.orderBy(F.col("piece_count").asc(), F.col("piece").asc())
        ranked = (
            estep_out.where(F.length("piece") > 1)
            .withColumn("rn", F.row_number().over(w))
            .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy()))
        )
        kept = ranked.where(F.expr(f"rn > m div {prune_denom}")).select(
            "piece", "piece_count"
        )
        return floored.unionByName(kept)

    out = None
    for it in range(iters):
        total = sum(counts.values())
        probs = {p: c / total for p, c in counts.items()}
        out = _prune_floor(_e_step(probs))
        if it < iters - 1:
            counts = {r["piece"]: int(r["piece_count"]) for r in out.collect()}
    return out


# --------------------------------------------------------------------------
# UNIGRAM-LM ENCODING (r9): the serving half of unigram_train, pure JVM
# --------------------------------------------------------------------------
#
# Applying a trained unigram model does not need Python either: the
# Viterbi DP over a word's (bounded) positions unrolls into a chain of
# whole-stage-codegen expressions — a rolling 4-register window of
# best scores (va..vd) plus a parallel window of segment counts, with
# the argmax as `greatest()` over (score, piece_length) structs (Spark
# compares struct fields lexicographically, the same (v, l) tuple
# order the trainer and the SQL oracle use). Piece probabilities come
# from a literal map (offline-trained stand-in, like DEFAULT_MERGES /
# the IVF fixed centroids). Tracking the segment COUNT alongside the
# score removes the need for a backpointer walk entirely: the chosen
# candidate's count is its predecessor's count + 1.

#: offline-trained stand-in unigram vocabulary as (piece, weight):
#: frequent subwords (all within the DP's max_piece_len of 4 — the
#: same bound the trainer's seed vocabulary uses) plus the latin
#: alphabet as fallback single chars (weights are the integer counts
#: a trainer would emit; probabilities are weight / total, computed
#: identically by the Spark literals and the oracle's VALUES table).
DEFAULT_UNIGRAM_VOCAB: tuple[tuple[str, int], ...] = (
    ("the", 50), ("scan", 20), ("part", 20), ("hash", 20),
    ("tab", 12), ("le", 12), ("val", 12), ("ue", 12), ("spa", 12),
    ("rk", 12), ("bat", 12), ("ch", 12), ("mer", 10), ("ge", 10),
    ("wind", 10), ("ow", 10), ("er", 15), ("in", 15), ("re", 15),
    ("on", 15), ("at", 15), ("ing", 12), ("ed", 12), ("es", 12),
) + tuple((c, 5) for c in "abcdefghijklmnopqrstuvwxyz")


def unigram_encode_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    vocab: Sequence[tuple[str, int]] = DEFAULT_UNIGRAM_VOCAB,
    max_word_len: int = 16,
    max_piece_len: int = 4,
) -> DataFrame:
    """Per-document unigram-LM token accounting with ZERO Python in
    the hot path: every whitespace word of <= ``max_word_len`` chars
    is Viterbi-segmented under the literal ``vocab``, and the per-doc
    aggregate reports ``(id, n_words, n_covered, n_pieces,
    pieces_per_word)`` — ``n_covered`` counts DP-eligible words with a
    positive-probability segmentation (a word containing an
    out-of-vocab character, or longer than the bound, is excluded
    from the piece stats), ``pieces_per_word`` is pieces / covered
    words (the fertility metric; NULL when nothing is covered).

    The DP is ONE ``F.aggregate`` fold over ``sequence(1, len(word))``
    whose accumulator carries a rolling 4-register window of (score,
    segment count) pairs — runtime-iterative, so the 4-way recurrence
    never materializes as a duplicated expression tree (the same
    blowup the trainer's oracle avoids with chained CTEs). The argmax
    is ``greatest()`` over ``struct(score, piece_len, count)`` —
    Spark's field-order struct comparison IS the (max score, longest
    piece) tiebreak the trainer and its oracle use. Tracking the
    segment count in the accumulator removes the backpointer walk
    entirely: the chosen candidate's count is its predecessor's + 1.

    The word-length bound matches :func:`unigram_train` (and keeps
    the SQL oracle's unrolled replay finite); longer words count in
    ``n_words`` only. One explode + one per-doc aggregate, no UDF, no
    extra shuffle."""
    total = sum(wt for _, wt in vocab)
    if any(len(pc) > max_piece_len or not pc for pc, _ in vocab):
        raise ValueError(f"vocab pieces must be 1..{max_piece_len} chars")
    pmap = F.create_map(
        *[x for pc, wt in vocab for x in (F.lit(pc), F.lit(wt / total))]
    )

    w = F.col("__w")
    zero = F.lit(0.0).cast("double")
    regs = ("vd", "vc", "vb", "va")  # score at i-1, i-2, i-3, i-4
    cnts = ("cd", "cc", "cb", "ca")

    def step(acc, i):
        cands = []
        for l in range(1, max_piece_len + 1):
            piece = w.substr(i - F.lit(l) + 1, F.lit(l))
            p = F.when(
                i >= l, F.coalesce(F.element_at(F.col("__pm"), piece), zero)
            ).otherwise(zero)
            cands.append(
                F.struct(
                    (acc[regs[l - 1]] * p).alias("v"),
                    F.lit(l).alias("l"),
                    (acc[cnts[l - 1]] + 1).alias("c"),
                )
            )
        best = F.greatest(*cands)
        return F.struct(
            best["v"].alias("vd"),
            acc["vd"].alias("vc"),
            acc["vc"].alias("vb"),
            acc["vb"].alias("va"),
            best["c"].alias("cd"),
            acc["cd"].alias("cc"),
            acc["cc"].alias("cb"),
            acc["cb"].alias("ca"),
        )

    init = F.struct(
        F.lit(1.0).cast("double").alias("vd"),
        zero.alias("vc"),
        zero.alias("vb"),
        zero.alias("va"),
        F.lit(0).alias("cd"),
        F.lit(0).alias("cc"),
        F.lit(0).alias("cb"),
        F.lit(0).alias("ca"),
    )
    fin = F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step)

    words = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__w")
    ).where(w != "")
    # the DP runs over word TYPES, not occurrences (the Heaps'-law
    # contraction every trainer here uses, and the same shape as this
    # query's oracle): higher-order folds evaluate interpreted, so
    # paying the fold once per distinct word instead of once per token
    # cut the benched sf0.1 cost ~20x (22.4s -> ~1s). One extra
    # distinct+join shuffle, both sides word-type-sized.
    eligible = F.length(w) <= max_word_len
    types = (
        words.select("__w")
        .distinct()
        .where(eligible)
        .withColumn("__pm", pmap)
        .select(
            "__w",
            (fin["vd"] > 0).alias("__cov"),
            fin["cd"].alias("__np"),
        )
    )
    scored = words.join(types, "__w", "left").select(
        id_col,
        F.coalesce(F.col("__cov"), F.lit(False)).alias("__cov"),
        F.coalesce(F.col("__np"), F.lit(0)).alias("__np"),
    )
    covered = F.col("__cov").cast("int")
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(covered).cast("bigint").alias("n_covered"),
        F.sum(covered * F.col("__np")).cast("bigint").alias("n_pieces"),
    )
    return out.withColumn(
        "pieces_per_word",
        F.when(
            F.col("n_covered") > 0, F.round(F.col("n_pieces") / F.col("n_covered"), 4)
        ),
    )


# --------------------------------------------------------------------------
# BPE ENCODING (r4): the serving half of bpe_train, pure JVM
# --------------------------------------------------------------------------
#
# Applying a trained merge table does NOT need Python: represent a
# word's symbol sequence as a '||'-delimited string ('||h||i||') and
# each merge (a, b) -> ab becomes one non-regex replace of '|a||b|'
# with '|ab|'. The double delimiter makes boundary checks exact (a
# pattern can only align on whole symbols — '|a||b|' cannot match
# inside '||xa||by||') while adjacent occurrences share no characters,
# so the engine's leftmost-non-overlapping replace IS the greedy
# left-to-right merge pass. Folding the merge table in rank order
# yields one whole-stage-codegen expression chain — no UDF, no shuffle,
# and any SQL engine with replace() replays it bit-for-bit.
#
# Rank-order application is the standard sequential BPE encode
# (Sennrich et al. 2016): a merge learned at rank r references only
# symbols that existed at training step r, so by the time rank r is
# applied every constituent merge has already run. (The iterative
# lowest-rank-first formulation can differ only when two different
# merge paths produce the same symbol string — excluded by
# construction in tables from bpe_train, which never relearns an
# existing symbol pair.)

# Offline-trained stand-in merge table (rank order), chaining through
# multi-level merges (t+h -> th, th+e -> the, i+n -> in, in+g -> ing).
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "u"), ("s", "t"),
    ("in", "g"), ("e", "d"), ("a", "t"), ("o", "r"), ("e", "s"),
)


def bpe_symbols_expr(word: Column) -> Column:
    """A word as its '||'-delimited character-symbol string."""
    return F.concat(F.lit("||"), F.array_join(F.split(word, ""), "||"), F.lit("||"))


def bpe_encode_expr(
    word: Column, merges: Sequence[tuple[str, str]] = DEFAULT_MERGES
) -> Column:
    """The encoded symbol string after applying ``merges`` in rank
    order — a pure JVM replace() chain (see module note). Words must
    not contain the reserved delimiter character '|'."""
    s = bpe_symbols_expr(word)
    for a, b in merges:
        if "|" in a or "|" in b:
            raise ValueError("merge symbols must not contain the '|' delimiter")
        s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return s


def bpe_pieces_expr(encoded: Column) -> Column:
    """The piece array of a '||'-delimited encoded string."""
    trimmed = F.regexp_replace(encoded, r"^\|\||\|\|$", "")
    return F.split(trimmed, r"\|\|")


def bpe_piece_count_expr(encoded: Column) -> Column:
    """Piece count of an encoded string: pipes/2 - 1 (every piece
    boundary, including both ends, is exactly '||')."""
    pipes = F.length(encoded) - F.length(F.replace(encoded, F.lit("|"), F.lit("")))
    return (pipes / 2 - 1).cast("int")
