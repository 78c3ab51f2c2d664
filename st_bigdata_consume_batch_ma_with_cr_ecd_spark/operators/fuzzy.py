"""Fuzzy string matching without a cross join (entity resolution).

The data-cleaning primitive behind deduplicating names, product
titles, and user-typed identifiers: find all pairs within edit
distance ``k``. The naive plan is a cartesian ``levenshtein(a, b)``
filter — O(n^2) comparisons, dead at corpus scale. This module uses
FastSS deletion-neighborhood blocking (Bocek et al. 2007, "Fast
Similarity Search in Large Dictionaries"):

    lev(a, b) <= 1  =>  the deletion neighborhoods of a and b
                        intersect (delete-one-char variants + the
                        string itself)

so candidates come from an EQUI-join on variant strings — shuffle on
the variant key, bucket sizes bounded by how many strings share a
variant — and a final ``levenshtein`` verify kills the false positives
(deletion neighborhoods also collide for farther pairs). The blocking
is PROVABLY COMPLETE: at ``max_distance=1`` a substitution at position
i collides on both strings' delete-at-i variant, an insertion/deletion
collides on the longer string's delete variant and the shorter string
itself; at ``max_distance=2`` the recursive (SymSpell-style) depth-2
deletion neighborhoods intersect on the common subsequence an optimal
edit script leaves behind. Every verified pair is therefore exact —
same answers as the cross join, never the cost.

Scale shape: |variants| = L+1 per string of length L, so the explode
is linear in total characters; the candidate join is a plain string
equi-join (AQE-eligible, skew-splittable); the verify runs only on
candidates. The DuckDB oracle for the registered query runs the
quadratic plan — the classic exact-oracle-vs-scale-path pairing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delete_one_each(c: Column) -> Column:
    """Array of every delete-one-character variant of ``c`` (L entries,
    possibly with duplicates — runs of equal characters collide)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - F.lit(1)), c.substr(i + F.lit(1), F.length(c))),
    )


def deletion_variants(col: Column | str) -> Column:
    """The FastSS k=1 neighborhood: the string itself plus every
    delete-one-character variant (L+1 entries, deduped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_union(F.array(c), _delete_one_each(c))


def deletion_neighborhood(col: Column | str, k: int) -> Column:
    """The recursive (SymSpell-style) deletion neighborhood D_<=k: every
    string obtainable from ``col`` by deleting AT MOST ``k`` characters,
    deduped. D_<=k is built by ``k`` rounds of delete-one over the
    previous level — |D_<=k| grows as O(L^k), which is why callers cap
    ``k`` at 2 (L^2 variants per string is the documented cost of
    distance-2 blocking; see SCALE.md round 6)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.array(c)
    for _ in range(k):
        out = F.array_distinct(
            F.flatten(
                F.transform(out, lambda t: F.array_union(F.array(t), _delete_one_each(t)))
            )
        )
    return out


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    *,
    max_distance: int = 1,
    id_col: str | None = None,
    max_variant_freq: int | None = None,
) -> DataFrame:
    """All distinct string pairs ``(a, b)`` with ``a < b`` and
    ``levenshtein(a, b) <= max_distance``, via deletion-neighborhood
    blocking + verify. ``max_distance`` of 1 (FastSS) and 2
    (SymSpell-style recursive deletion neighborhoods) are supported.

    Completeness for k edits (Bocek et al. 2007, Lemma 4.5 / the
    SymSpell invariant): if ``lev(a, b) <= k`` then the depth-k
    deletion neighborhoods ``D_<=k(a)`` and ``D_<=k(b)`` intersect —
    align an optimal edit script; deleting from each string the
    characters the script substitutes/inserts into the other leaves the
    common subsequence, reachable from both sides with at most k
    deletions each. The converse is false (neighborhoods also collide
    for some farther pairs), which is what the levenshtein verify
    removes — so the result is EXACT at any scale. Beyond k=2 the
    O(L^k) variant blow-up stops paying; use MinHash/LSH families for
    looser matching.

    Pairs are generated from GROUPED variant buckets (group by variant
    -> sorted string list -> upper triangle), not a self-join — the
    same shape as every other pair generator in this engine
    (``llm.dedup._bucket_pairs``): one shuffle on the variant key, and
    the deletion-neighborhood explode runs once, not twice.

    ``max_variant_freq`` is the 100-TB skew guard (r4 review finding
    #3): a variant shared by B strings emits B(B-1)/2 candidates, and
    on real name corpora short common strings make B explode (every
    length-1 string shares the empty-string variant). Buckets larger
    than the cap are dropped BEFORE pair generation. The cap is a
    RECALL knob: a true pair is lost only if every variant it collides
    on is hotter than the cap, which for edit-distance-1 pairs means
    >cap strings within distance 2 of each other — a degenerate
    near-duplicate cluster better served by exact dedup first. The
    default is ``None`` — the public operator stays EXACT unless a
    caller opts into the cap (r5 advice: a silent default cap dropped
    true pairs in hot buckets for every caller); the registered
    corpus-scale queries opt in explicitly and pin, via their quadratic
    DuckDB oracles, that the cap drops nothing on the test corpora
    (hottest bucket is far below 256)."""
    if max_distance not in (1, 2):
        raise ValueError("fuzzy_self_pairs supports max_distance in {1, 2}")
    from ..operators.partitioning import pinned_group_repartition

    # pin the dedup exchange's width so the deletion-neighborhood
    # explode below — the O(L^k)-per-string CPU stage — fans across the
    # session's full width: AQE sizes the distinct's output by the
    # BYTES of the deduped names (tiny), coalesces it to 1-2
    # partitions, and the entire neighborhood construction then ran on
    # 1-2 of 32 cores (stage probe: explode+hash 10.8 s of the k=2
    # row's ~15 s). The explicit repartition on the name key is reused
    # by the distinct's aggregate (same distribution), so this adds NO
    # shuffle — it only pins the width of the one distinct pays anyway.
    strings = pinned_group_repartition(
        df.select(F.col(col).alias("s")).where(F.col("s").isNotNull()), "s"
    ).distinct()
    exploded = strings.select(
        "s", F.explode(deletion_neighborhood(F.col("s"), max_distance)).alias("v")
    )
    if max_variant_freq is None:
        # The variant is only a MATCH key — it is never read back — so
        # shuffle an 8-byte xxhash64 of it instead of the variant string
        # (guide-§2.3 "shuffle keys, not payloads": at k=2 the explode
        # emits ~L^2/2 variants per string and the variant bytes dominate
        # the exchange). A hash collision can only MERGE two buckets,
        # which adds candidate pairs the levenshtein verify then kills —
        # completeness (equal variants hash equal) and the verified
        # result are unchanged, unconditionally. Only safe UNCAPPED:
        # with max_variant_freq a merged bucket could spuriously exceed
        # the cap and drop true pairs, so capped callers keep the exact
        # string key.
        exploded = exploded.select("s", F.xxhash64("v").alias("v"))
    # pin the variant-bucket exchange's width (same rationale as
    # llm/dedup._bucket_pairs): AQE coalesces it by the grouped BYTES
    # and the upper-triangle pair explode then runs on 1-2 cores —
    # measured 18.0 -> 12.7 s on the k=2 query once pinned; the
    # repartition is reused by the groupBy, so no extra shuffle
    from ..operators.partitioning import pinned_group_repartition

    exploded = pinned_group_repartition(exploded, "v")
    grouped = exploded.groupBy("v").agg(F.sort_array(F.collect_set("s")).alias("__ss"))
    grouped = grouped.where(F.size("__ss") >= 2)
    if max_variant_freq is not None:
        grouped = grouped.where(F.size("__ss") <= max_variant_freq)
    # the banded verify is computed INSIDE the pair struct: phrasing it
    # as select-then-filter lets Catalyst push the filter through the
    # projection and re-derive the predicate in terms of the struct —
    # evaluating levenshtein TWICE per candidate (observed in the plan:
    # a Filter node and a Project node each carrying the call, and
    # whole-stage codegen does not CSE across them). Built in the
    # transform, the Generate computes dist once and the filter/project
    # are plain field extractions.
    # (r14 probe, rejected: moving the dist >= 0 verify INSIDE the
    # lambda — filter(transform(...), p -> p.dist >= 0) before the
    # flatten — measured flat-to-worse (A/B x3: 7.85-8.72 s vs
    # 8.57-9.18 s). Whole-stage codegen already fuses Generate with
    # the downstream Filter, so false candidates never materialize as
    # rows; the in-lambda filter only adds array allocations.)
    pair_structs = F.expr(
        "transform(__ss, (x, i) ->"
        " transform(slice(__ss, i + 2, size(__ss)),"
        f" y -> struct(x AS name_a, y AS name_b,"
        f" levenshtein(x, y, {int(max_distance)}) AS dist)))"
    )
    cands = grouped.select(F.explode(F.flatten(pair_structs)).alias("p"))
    # verify BEFORE the pair-distinct: the banded levenshtein runs in
    # the explode's own stage, so the distinct exchange carries only
    # TRUE pairs instead of the candidate multiset. The r10 A/B
    # measured this ordering 365.1s vs 336.5s at the 16x probe point
    # and kept distinct-first — but that was with the full O(L^2) DP
    # verify; the r13 banded form (O(k*L) cells, threshold
    # `levenshtein(a, b, k)`) is ~5x cheaper per candidate, which
    # flips the trade (re-A/B'd this round, see OPTIMIZATION_r13.md).
    # Equivalence: dist is FUNCTIONAL on the pair, so
    # distinct(name_a, name_b, dist) of the filtered multiset equals
    # the old filter-after-distinct row for row.
    return (
        cands.where(F.col("p.dist") >= 0)
        .select(
            F.col("p.name_a").alias("name_a"),
            F.col("p.name_b").alias("name_b"),
            F.col("p.dist").alias("dist"),
        )
        .distinct()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_distance: int = 1,
) -> DataFrame:
    """Two-table fuzzy equi-join: every (left row, right row) pair
    whose strings are within ``max_distance`` edits (1 or 2 — FastSS /
    SymSpell deletion neighborhoods, same completeness argument as
    :func:`fuzzy_self_pairs`), via the same blocking. Output keeps all
    columns of both sides (right columns colliding with left names get
    a ``_right`` suffix) plus ``dist``."""
    if max_distance not in (1, 2):
        raise ValueError("fuzzy_join supports max_distance in {1, 2}")
    # row-identity keys (not full-row distinct): two IDENTICAL input
    # rows must each produce their pairs — deduping on row content
    # would silently merge them (r4 review finding). The ids only key
    # the multi-variant-candidate dedup and are dropped before return.
    # localCheckpoint PINS the ids before the explode+join consumes
    # them twice-removed: monotonically_increasing_id is assigned
    # per-task, so under task retry / speculative execution a
    # recomputed partition could re-key rows differently between the
    # evaluations feeding the join, corrupting the (__lid, __rid)
    # dedup (r4 advice). Materializing the stamped frame makes every
    # downstream read see one fixed assignment.
    # the exploded variant is only an equi-join key (never read back), so
    # hash it to 8 bytes before the exchange — a collision merely adds a
    # candidate row the levenshtein filter kills (no cap here, so the
    # result is exact unconditionally; see fuzzy_self_pairs)
    lv = (
        left.withColumn("__lid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
        .select(
            "*",
            F.explode(deletion_neighborhood(F.col(left_col), max_distance)).alias("__vs"),
        )
        .withColumn("__v", F.xxhash64("__vs"))
        .drop("__vs")
    )
    rv = (
        right.withColumn("__rid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
        .select(
            "*",
            F.explode(deletion_neighborhood(F.col(right_col), max_distance)).alias("__vs"),
        )
        .withColumn("__v", F.xxhash64("__vs"))
        .drop("__vs")
    )
    l, r = lv.alias("l"), rv.alias("r")
    joined = l.join(r, F.col("l.__v") == F.col("r.__v")).drop("__v")
    left_cols = set(left.columns)
    proj = [F.col("l.__lid"), F.col("r.__rid")]
    proj += [F.col(f"l.{c}") for c in left.columns]
    for c in right.columns:
        out = f"{c}_right" if c in left_cols else c
        proj.append(F.col(f"r.{c}").alias(out))
    rc = f"{right_col}_right" if right_col in left_cols else right_col
    # banded threshold verify — exact distance within max_distance, -1 past it
    dist = F.levenshtein(F.col(left_col), F.col(rc), max_distance)
    return (
        joined.select(*proj)
        .dropDuplicates(["__lid", "__rid"])
        .drop("__lid", "__rid")
        .withColumn("dist", dist)
        .where(F.col("dist") >= 0)
    )
