"""Measured scaling evidence: run headline operators on Nx-amplified
inputs and report wall-clock + throughput, so "would this survive a
scale-up?" is answered with numbers instead of plan-reading alone.

Amplification unions the sf table with itself ``mult`` times, shifting
every key column by a replica offset — group/join key cardinality
scales WITH the data (the realistic case: more orders means more order
keys, not hotter keys), while low-cardinality dimensions (returnflag,
status) stay fixed like real enums do. Timing uses the noop sink
(bench.py's no-pruning trap note applies).

Usage:  python tools/scale_probe.py [--sf DIR] [--mults 1,4,8]
Prints one line per (query, mult): seconds + input Mrows/s, then a
linearity verdict (time ratio vs data ratio between the largest pair).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.aggregates import rounded_sum  # noqa: E402
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.dedup import top_n_per_group  # noqa: E402
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark  # noqa: E402

SHIFT = 1_000_000_000


def amplify(df: DataFrame, mult: int, key_cols: list[str]) -> DataFrame:
    """Union ``mult`` replicas, shifting integer key columns so key
    cardinality scales with the data volume."""
    if mult == 1:
        return df
    parts = []
    for r in range(mult):
        rep = df
        for c in key_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(r * SHIFT))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_BASE_COUNTS: dict[str, tuple[int, int]] = {}

# per-(sf, mult) stores built ONCE, untimed, for the serve-only probes:
# the signature tables / IVF index a nightly job reads are built by
# PRIOR nights — timing their construction would re-measure the
# full-recompute path the served design exists to avoid
_SIG_STORES: dict[tuple, str] = {}
_IVF_STORES: dict[tuple, tuple] = {}


def probes(
    spark: SparkSession, sf_dir: str, mult: int, only: set[str] | None = None
) -> dict[str, tuple[DataFrame, int]]:
    def want(name: str) -> bool:
        # expensive store builds are gated on the probe being selected;
        # --only runs must not pay for stores they never serve from
        return only is None or name in only
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    if sf_dir not in _BASE_COUNTS:  # constant across mults — count once
        _BASE_COUNTS[sf_dir] = (li.count(), orders.count())
    n_li, n_o = _BASE_COUNTS[sf_dir]
    li_m = amplify(li, mult, ["l_orderkey"])
    o_m = amplify(orders, mult, ["o_orderkey", "o_custkey"])

    agg = (
        li_m.where(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rounded_sum("l_quantity", 2).alias("sum_qty"),
            rounded_sum("l_extendedprice", 2).alias("sum_base"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    topn = top_n_per_group(
        li_m,
        ["l_orderkey"],
        [F.col("l_shipdate").desc(), F.col("l_linenumber").desc(), F.col("l_quantity").desc()],
    )

    join = (
        li_m.join(o_m.select("o_orderkey", "o_orderdate"), li_m.l_orderkey == o_m.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(rounded_sum("l_extendedprice", 2).alias("rev"))
    )

    # the dedup/CF family's core: grouped per-bucket pair generation
    # (pairs per bucket stay constant; bucket count scales with data)
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import _bucket_pairs

    pair_gen = _bucket_pairs(
        li_m.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("doc"))
        .distinct(),
        "o",
        distinct_pairs=False,
    )

    # one iteration of the graph-rank template: contribution join +
    # destination aggregate (node cardinality scales with the data —
    # supplier keys shift too, or replicas would concentrate mass on a
    # fixed hot dst set and measure growing skew instead of scale)
    li_g = amplify(li, mult, ["l_orderkey", "l_suppkey"])
    edges = (
        o_m.join(li_g, o_m.o_orderkey == li_g.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    rank_iter = (
        edges.join(deg, "src")
        .select("dst", F.round(F.lit(1.0) / F.col("outdeg"), 12).cast("decimal(26,12)").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("in_mass"))
    )

    # r3 bench heavy hitters (9.9s / 7.3s / 13.8s at sf0.1), probed at
    # amplified scale so SCALE.md's sublinearity table covers them:

    # recsys: capped per-basket pair generation -> support-pruned
    # co-occurrence counts -> top-k. Baskets (customers) scale with the
    # data, basket SIZES stay fixed (replica shape) — pair volume, the
    # dominant cost, scales linearly by construction; the probe verifies
    # the plan doesn't break that.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        _CF_BASKET_CAP,
        _CF_MIN_SUPPORT,
        _CF_TOPK,
    )

    li_r = amplify(li, mult, ["l_orderkey", "l_partkey"])
    o_r = amplify(orders, mult, ["o_orderkey", "o_custkey"])
    cp = (
        o_r.join(li_r, o_r.o_orderkey == li_r.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("doc"))
        .distinct()
    )
    sizes = cp.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
    keep = cp.join(sizes.where(F.col("n") <= _CF_BASKET_CAP), "c").select("c", "doc")
    cf_pairs = (
        _bucket_pairs(keep, "c", distinct_pairs=False)
        .groupBy(F.col("doc_a").alias("pa"), F.col("doc_b").alias("pb"))
        .agg(F.count(F.lit(1)).alias("cij"))
        .where(F.col("cij") >= _CF_MIN_SUPPORT)
    )
    recsys = top_n_per_group(
        cf_pairs, ["pa"], [F.col("cij").desc(), F.col("pb").asc()], n=_CF_TOPK
    )

    # triangle counting on the part co-purchase graph: disjoint replica
    # components -> triangles scale linearly; degree orientation must
    # keep the wedge join bounded as hubs replicate.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.functions.columns import (
        md5_prefix_int,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import (
        oriented_triangle_count,
    )

    li_t = li_r.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("doc")).distinct()
    t_edges = _bucket_pairs(li_t, "o").select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    triangles = oriented_triangle_count(t_edges)
    # DOULION twin (p=1/2, deterministic md5 coin — same scheme as the
    # registered graph_triangle_count_approx): the wedge volume the
    # amplified graph densifies superlinearly should drop ~p^2 before
    # any shuffle, so the probe pair quantifies the approximation's
    # scale payoff against the exact operator's documented superlinearity
    ekey = F.concat(F.col("u").cast("string"), F.lit(":"), F.col("v").cast("string"))
    t_sampled = t_edges.where(
        md5_prefix_int(ekey).cast("decimal(20,0)") * 2
        < F.lit(4294967296 * 1).cast("decimal(20,0)")
    )
    triangles_approx = oriented_triangle_count(t_sampled).select(
        (F.col("n_triangles") * 8).alias("est_triangles")
    )

    # consume-batch e2e COMPUTE (derive + stage-0 merge + 4 slice
    # chains + union), sinks excluded: the gzip files=1 sinks are the
    # reference's fixed output contract (serial by design) and would
    # only measure gzip throughput here.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.pipelines.consume_batch import (
        consume_batch,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.consume_e2e import (
        _DATES,
        derive_consume_inputs,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if sf_dir + "/ev" not in _BASE_COUNTS:
        _BASE_COUNTS[sf_dir + "/ev"] = (ev.count(), 0)
    n_ev = _BASE_COUNTS[sf_dir + "/ev"][0]
    ev_m = amplify(ev, mult, ["event_id", "user_id"])
    t = derive_consume_inputs(spark, sf_dir, events=ev_m)

    def e2e_compute() -> None:
        # the e2e workload's own shape: materialize the shared stage-0
        # merge FIRST (one job), then the 4 slice chains read the
        # InMemoryRelation — timing the unmaterialized plan instead
        # recomputes stage-0 once per slice partition-tree
        df = consume_batch(
            t["changelog"], t["texts"], t["visibility"], t["fraud"],
            t["contacts"], t["visits"], t["bundeslaender"], t["stadtlandkreise"],
            _DATES,
            stage0_mode="cached",
            materialize=True,
        )
        df.write.format("noop").mode("overwrite").save()

    def e2e_staged() -> None:
        # staging twin (r6 review ask #1): stage-0 written ONCE to a
        # parquet staging table, slices scan the files — the mode for
        # when stage-0 outgrows the cache tier (the measured 64x knee)
        import os
        import shutil
        import tempfile

        staging = os.path.join(tempfile.gettempdir(), "spark_graft_probe_stage0")
        shutil.rmtree(staging, ignore_errors=True)
        try:
            df = consume_batch(
                t["changelog"], t["texts"], t["visibility"], t["fraud"],
                t["contacts"], t["visits"], t["bundeslaender"], t["stadtlandkreise"],
                _DATES,
                stage0_staging=staging,
            )
            df.write.format("noop").mode("overwrite").save()
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    # image near-dedup chain (synth BMP -> real decode/dHash -> Hamming
    # LSH -> pinned verify). The pattern space scales WITH the mult
    # (n_patterns = 37 * mult) so near-dup cluster sizes stay constant
    # and pair volume stays linear — the probe measures the plan, not
    # the quadratic true-pair growth a fixed pattern count would force.
    # Wrapped as a callable: the signature checkpoint inside IS part of
    # the measured work (same rationale as kcore).
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
        image_dhash_verified_pairs,
    )

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if sf_dir + "/docs" not in _BASE_COUNTS:
        _BASE_COUNTS[sf_dir + "/docs"] = (docs_tbl.count(), 0)
    n_docs_i = _BASE_COUNTS[sf_dir + "/docs"][0]

    # web-corpus prep composite (URL canon -> mirror dedup window ->
    # HTML extract over survivors): per-row regex work + one window +
    # one doc-sized join — expected linear; the probe guards the
    # composition. Amplified doc_ids keep the 6-variant mirror groups
    # intact within each replica (the group key doc_id DIV 6 shifts
    # with the replica; replica-boundary groups are at most partial,
    # which the canonicalizer handles like any short group).
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
        web_corpus_prep,
    )

    docs_full = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    web_prep = web_corpus_prep(amplify(docs_full, mult, ["doc_id"]))

    def image_dedup_compute() -> None:
        docs_i = amplify(docs_tbl, mult, ["doc_id"])
        image_dhash_verified_pairs(docs_i, n_patterns=37 * mult).write.format(
            "noop"
        ).mode("overwrite").save()

    def image_dedup_k3_compute() -> None:
        # the scale-path twin: 4 blocks of 16 bits (65k-value band keys)
        # complete for hamming <= 3, vs the default 8 blocks of 8 bits
        # (256-value keys) complete for <= 7 — the 256-value key space
        # saturates as the corpus grows and candidate volume goes
        # quadratic (Manku et al. WWW'07 trade wider blocks for a lower
        # threshold for exactly this reason)
        docs_i = amplify(docs_tbl, mult, ["doc_id"])
        image_dhash_verified_pairs(
            docs_i, n_patterns=37 * mult, band_hex_width=4, max_hamming=3
        ).write.format("noop").mode("overwrite").save()

    def audio_dedup_compute() -> None:
        # audio near-dedup chain (synth WAV -> real decode -> window
        # energies -> contour signature -> wide-block Hamming LSH ->
        # pinned verify -> CC -> survivor). Pattern space scales WITH
        # the mult so cluster sizes stay constant and pair volume stays
        # linear; wide blocks from birth (the r7 image lesson)
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            audio_dedup_pipeline,
        )

        docs_i = amplify(docs_tbl, mult, ["doc_id"])
        audio_dedup_pipeline(docs_i, n_patterns=37 * mult).write.format(
            "noop"
        ).mode("overwrite").save()

    def image_pipeline_k3_compute() -> None:
        # the COMPOSED wide-block pipeline (pairs -> CC -> survivor),
        # i.e. corpus_image_dedup_pipeline_wide's plan: the r7 verdict
        # graded the previous composed pipeline weak because only the
        # standalone pair stage was probed while the registered
        # composition still ran the quadratic blocking — this probe
        # point keeps the driver-gated composition itself on the curve
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            image_dedup_pipeline,
        )

        docs_i = amplify(docs_tbl, mult, ["doc_id"])
        image_dedup_pipeline(docs_i, n_patterns=37 * mult).write.format(
            "noop"
        ).mode("overwrite").save()

    def multimodal_summary_compute() -> None:
        # the cross-modal dedup summary composition (r8 verdict ask #8:
        # corpus_multimodal_dedup_summary composes two audited
        # pipelines plus a text-fingerprint window and two doc-keyed
        # joins, but had no probe of its own). Pattern space scales
        # with the mult like the per-modality probes; replica texts are
        # tag-prefixed so exact-text clusters stay constant per replica
        # (untagged replicas would grow every text cluster with the
        # mult and measure window skew, not the composition).
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            multimodal_dedup_summary,
        )

        reps = [
            docs_full.select(
                (F.col("doc_id") + F.lit(r * SHIFT)).alias("doc_id"),
                F.concat(F.lit(f"R{r}x"), F.col("text")).alias("text"),
            )
            for r in range(mult)
        ]
        docs_mm = reps[0]
        for rep in reps[1:]:
            docs_mm = docs_mm.unionByName(rep)
        multimodal_dedup_summary(docs_mm, n_patterns=37 * mult).write.format(
            "noop"
        ).mode("overwrite").save()

    # incremental modal dedup twins (r8 verdict ask #5): the corpus
    # grows with the mult but the ARRIVING BATCH stays a constant
    # absolute size (doc_id % (5 * mult) = 0 — the same 1/(5*mult)
    # fraction of a mult-times-larger corpus), so the pair stage's
    # cost must stay flat while the signature stage scans the corpus
    # linearly (at 100 TB the historic signatures come from a stored
    # table; the probe measures the pair machinery, which is the part
    # that would otherwise go quadratic).
    def image_incr_compute() -> None:
        docs_i = amplify(docs_tbl, mult, ["doc_id"])
        image_dhash_verified_pairs(
            docs_i,
            n_patterns=37 * mult,
            band_hex_width=4,
            max_hamming=3,
            pair_filter_sql=f"x % {5 * mult} = 0 OR y % {5 * mult} = 0",
        ).write.format("noop").mode("overwrite").save()

    def audio_incr_compute() -> None:
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            audio_contour_verified_pairs,
        )

        docs_i = amplify(docs_tbl, mult, ["doc_id"])
        audio_contour_verified_pairs(
            docs_i,
            n_patterns=37 * mult,
            pair_filter_sql=f"x % {5 * mult} = 0 OR y % {5 * mult} = 0",
        ).write.format("noop").mode("overwrite").save()

    # SERVED incremental dedup (r9 verdict ask #1's measurement): the
    # image_incr/audio_incr probes above hold the batch constant but
    # still re-decode the WHOLE corpus for signatures every run — their
    # residual linear growth is that scan. The *_served probes read the
    # HISTORIC signatures from a versioned signature table (built once
    # per (sf, mult), untimed — prior nights' output) and time the true
    # nightly cost: batch signatures + atomic MERGE + batch-restricted
    # pair generation over the post-merge snapshot. TOTAL timed cost
    # must now track the batch, not the corpus.
    import os as _os2
    import shutil as _sh
    import tempfile as _tf

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        create_versioned_table,
        merge_versioned_table,
        read_versioned_table,
    )

    def _ensure_sig_store(modality: str, sig_fn) -> str:
        key = (modality, sf_dir, mult)
        if key not in _SIG_STORES:
            root = _os2.path.join(
                _tf.gettempdir(),
                f"spark_graft_probe_sigs_{modality}_{_os2.getpid()}_m{mult}",
            )
            _sh.rmtree(root, ignore_errors=True)
            table = f"{root}/signatures"
            docs_i = amplify(docs_tbl, mult, ["doc_id"])
            hist = sig_fn(
                docs_i.where(f"doc_id % {5 * mult} != 0"), n_patterns=37 * mult
            )
            create_versioned_table(
                hist.withColumn("ingest_bucket", F.lit(0)), table, ["ingest_bucket"]
            )
            _SIG_STORES[key] = table
        return _SIG_STORES[key]

    def _served_compute(modality: str, sig_fn, sig_col: str):
        table = _SIG_STORES[(modality, sf_dir, mult)]

        def compute() -> None:
            from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
                hamming_verified_pairs,
            )

            docs_i = amplify(docs_tbl, mult, ["doc_id"])
            batch = sig_fn(
                docs_i.where(f"doc_id % {5 * mult} = 0"), n_patterns=37 * mult
            )
            merge_versioned_table(
                spark,
                table,
                batch.withColumn("ingest_bucket", F.lit(1)),
                keys=["doc_id"],
                partition_by=["ingest_bucket"],
            )
            sigs = read_versioned_table(spark, table)
            hamming_verified_pairs(
                sigs.select("doc_id", sig_col),
                sig_col,
                band_hex_width=4,
                max_hamming=3,
                pair_filter_sql=f"x % {5 * mult} = 0 OR y % {5 * mult} = 0",
            ).write.format("noop").mode("overwrite").save()

        return compute

    image_served_compute = audio_served_compute = None
    image_served_mb_compute = image_incr_mb_compute = None
    if want("image_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            image_dhash_signatures,
        )

        _ensure_sig_store("image", image_dhash_signatures)
        image_served_compute = _served_compute(
            "image", image_dhash_signatures, "dhash"
        )
    if want("audio_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            audio_contour_signatures,
        )

        _ensure_sig_store("audio", audio_contour_signatures)
        audio_served_compute = _served_compute(
            "audio", audio_contour_signatures, "sig"
        )

    # payload-realistic served-vs-recompute pair (the 18x16 fixture's
    # decode is so cheap that parquet+merge overhead masks the served
    # design's point): payload_scale=8 grows each BMP to 144x128 (~55
    # KB — thumbnail-sized) WITHOUT changing a dHash bit, so the
    # recompute twin pays ~scale^2 more decode while the served path's
    # per-night cost stays signature-bound. At 100 TB payloads are MBs
    # and signatures stay 16 bytes — this pair measures that slope
    # separation directly.
    if want("image_served_mb") or want("image_incr_mb"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            hamming_verified_pairs,
            image_dhash_signatures,
        )

        # 55 KB payloads x the default 10k-row Arrow batch = ~550 MB of
        # Arrow buffers PER TASK before the decode UDF sees a row; 32
        # tasks overran the off-heap allocator at 64x (r11:
        # org.apache.arrow.memory.OutOfMemoryException in the store
        # build). Cap the batch so per-task buffers stay ~14 MB — the
        # knob every big-binary mapInPandas pipeline must size to its
        # payload, exactly as shuffle partitions are sized to rows.
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")

        def _img_sigs_mb(d, n_patterns):
            return image_dhash_signatures(
                d, n_patterns=n_patterns, payload_scale=8
            )

        if want("image_served_mb"):
            _ensure_sig_store("image_mb", _img_sigs_mb)
            image_served_mb_compute = _served_compute(
                "image_mb", _img_sigs_mb, "dhash"
            )

        def image_incr_mb_compute() -> None:
            docs_i = amplify(docs_tbl, mult, ["doc_id"])
            sigs = _img_sigs_mb(
                docs_i, n_patterns=37 * mult
            ).localCheckpoint(eager=True)
            hamming_verified_pairs(
                sigs,
                "dhash",
                band_hex_width=4,
                max_hamming=3,
                pair_filter_sql=f"x % {5 * mult} = 0 OR y % {5 * mult} = 0",
            ).write.format("noop").mode("overwrite").save()

    # IVF SERVING alone (r9 verdict ask #3: the stored-index queries
    # shipped with an argument, not a measurement): the vector-carrying
    # inverted file is trained + persisted once per (sf, mult), untimed;
    # the timed serve = probed-cell computation for a CONSTANT 3-query
    # batch + manifest-pruned read of those cells' partitions + in-cell
    # exact top-k. LOW-FAN-OUT regime on purpose — 64 cells, n_probe=2,
    # 3 queries, so the batch probes <= 6/64 cells and the manifest
    # pruning has something real to prune (the registered query's
    # 10x4-of-16 regime probes nearly every cell: it tests the pruned
    # path's correctness, not its payoff). Construction also prints the
    # file-count before/after pruning — the cid-pruning evidence.
    ivf_served_compute = ivfpq_served_compute = None
    n_embs = 0
    if want("ivf_served") or want("ivfpq_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
            ivf_cell_assignments,
            ivf_probed_cells,
            ivf_topk_from_inverted_file,
            train_ivf_centroids,
        )

        IVF_CELLS, IVF_PROBE = 64, 2
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if sf_dir + "/embs" not in _BASE_COUNTS:
            _BASE_COUNTS[sf_dir + "/embs"] = (embs.count(), 0)
        n_embs = _BASE_COUNTS[sf_dir + "/embs"][0]
        key = (sf_dir, mult)
        if key not in _IVF_STORES:
            root = _os2.path.join(
                _tf.gettempdir(), f"spark_graft_probe_ivf_{_os2.getpid()}_m{mult}"
            )
            _sh.rmtree(root, ignore_errors=True)
            embs_m = amplify(embs, mult, ["vec_id"])
            trained = train_ivf_centroids(embs_m, n_centroids=IVF_CELLS, iters=2)
            cents = [[float(x) for x in c] for c in trained]
            create_versioned_table(
                ivf_cell_assignments(embs_m, centroids=cents, carry_vectors=True),
                f"{root}/cells",
                ["cid"],
            )
            # pruning evidence (untimed): files the full read touches vs
            # the probed-cells read — the manifest drops the rest
            queries = embs_m.where(F.col("vec_id") < 3)
            cells = ivf_probed_cells(queries, centroids=cents, n_probe=IVF_PROBE)
            full_files = len(read_versioned_table(spark, f"{root}/cells").inputFiles())
            pruned_files = len(
                read_versioned_table(
                    spark, f"{root}/cells", partition_filter={"cid": cells}
                ).inputFiles()
            )
            print(
                f"ivf_served mult={mult}: probed {len(cells)}/{IVF_CELLS} cells, "
                f"index files {full_files} -> {pruned_files} after manifest pruning"
            )
            _IVF_STORES[key] = (root, cents)
        root, cents = _IVF_STORES[key]

        def ivf_served_compute() -> None:
            embs_m = amplify(embs, mult, ["vec_id"])
            queries = embs_m.where(F.col("vec_id") < 3)
            cells = ivf_probed_cells(queries, centroids=cents, n_probe=IVF_PROBE)
            inv = read_versioned_table(
                spark, f"{root}/cells", partition_filter={"cid": cells}
            )
            ivf_topk_from_inverted_file(
                inv, queries, centroids=cents, k=5, n_probe=IVF_PROBE
            ).write.format("noop").mode("overwrite").save()

        # IVFADC twin: same trained quantizer and probed-cell pruning,
        # but the inverted file carries 8-byte PQ CODES instead of the
        # float vectors (32x smaller cells) and serving is asymmetric
        # distance — broadcast per-query tables, 8 lookups per
        # candidate. The pair (ivf_served vs ivfpq_served) measures
        # what PQ buys at serve time beyond the shared pruning.
        if want("ivfpq_served"):
            from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
                ivf_pq_inverted_file,
                ivf_pq_topk_adc,
                pq_codebooks,
            )

            pq_key = (sf_dir, mult, "pq")
            books = pq_codebooks(n_subspaces=8, n_codes=16, dim=64, seed=13)
            if pq_key not in _IVF_STORES:
                pq_root = _os2.path.join(
                    _tf.gettempdir(),
                    f"spark_graft_probe_ivfpq_{_os2.getpid()}_m{mult}",
                )
                _sh.rmtree(pq_root, ignore_errors=True)
                embs_m = amplify(embs, mult, ["vec_id"])
                create_versioned_table(
                    ivf_pq_inverted_file(
                        embs_m, centroids=cents, codebooks=books
                    ),
                    f"{pq_root}/cells",
                    ["cid"],
                )
                _IVF_STORES[pq_key] = (pq_root, cents)
            pq_root, _ = _IVF_STORES[pq_key]

            def ivfpq_served_compute() -> None:
                embs_m = amplify(embs, mult, ["vec_id"])
                queries = embs_m.where(F.col("vec_id") < 3)
                cells = ivf_probed_cells(
                    queries, centroids=cents, n_probe=IVF_PROBE
                )
                inv = read_versioned_table(
                    spark, f"{pq_root}/cells", partition_filter={"cid": cells}
                )
                ivf_pq_topk_adc(
                    inv, queries, centroids=cents, codebooks=books,
                    k=5, n_probe=IVF_PROBE,
                ).write.format("noop").mode("overwrite").save()

    # k-core peel on the thresholded (>= 2 shared orders) co-purchase
    # graph: replicas are disjoint components, so the cascade runs
    # per-replica and cost tracks edge volume. Wrapped as a callable —
    # kcore_peel's eager per-round checkpoints ARE the measured work.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import kcore_peel

    def kcore_compute() -> None:
        und = (
            _bucket_pairs(li_t, "o", distinct_pairs=False)
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("ns"))
            .where(F.col("ns") >= 2)
        )
        e = (
            und.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            .union(und.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
            .localCheckpoint(eager=True)
        )
        core = kcore_peel(e, 3, 2)
        core.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).write.format(
            "noop"
        ).mode("overwrite").save()

    # FastSS fuzzy pairs -> min-label closure (the ER spine, r5's new
    # grouped-bucket generator + merge-hinted rounds). Replicas prefix
    # names with a doubled letter ('AA', 'BB', ...) so any cross-replica
    # pair is >= 2 edits apart — near-dup structure replicates instead
    # of densifying, and pair volume scales linearly by construction.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.fuzzy import (
        fuzzy_self_pairs,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import (
        connected_components,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_name")
    if sf_dir + "/cust" not in _BASE_COUNTS:
        _BASE_COUNTS[sf_dir + "/cust"] = (cust.count(), 0)
    n_cust = _BASE_COUNTS[sf_dir + "/cust"][0]
    reps = [
        cust.select(F.concat(F.lit(chr(65 + r) * 2), F.col("c_name")).alias("c_name"))
        for r in range(mult)
    ]
    cust_m = reps[0]
    for rep in reps[1:]:
        cust_m = cust_m.unionByName(rep)

    def fuzzy_er_compute() -> None:
        pairs = fuzzy_self_pairs(cust_m, "c_name", max_variant_freq=256).select(
            "name_a", "name_b"
        )
        comps = connected_components(pairs, "name_a", "name_b", edges_distinct=True)
        comps.groupBy("label").agg(F.count(F.lit(1)).alias("sz")).write.format(
            "noop"
        ).mode("overwrite").save()

    # k=2 fuzzy matching (the heaviest bench row, 23.6s at sf0.1 — r7
    # verdict ask #4). Replicas prefix names with TRIPLED letters
    # ('AAA', 'BBB', ...): any cross-replica pair is >= 3 edits apart,
    # beyond the k=2 threshold, so the name-pattern space scales WITH
    # the mult — cluster sizes (and the synthetic fixture's dense-
    # cluster artifact) stay CONSTANT per replica and true-pair volume
    # grows linearly by construction. Amplifying the fixed fixture
    # instead would quadratically densify its single dense cluster and
    # measure the fixture, not the plan.
    reps3 = [
        cust.select(F.concat(F.lit(chr(65 + r) * 3), F.col("c_name")).alias("c_name"))
        for r in range(mult)
    ]
    cust_m3 = reps3[0]
    for rep in reps3[1:]:
        cust_m3 = cust_m3.unionByName(rep)

    def fuzzy_k2_compute() -> None:
        fuzzy_self_pairs(cust_m3, "c_name", max_distance=2).select(
            "name_a", "name_b", "dist"
        ).write.format("noop").mode("overwrite").save()

    # Exact-Jaccard prefix filter with the r6 set-intersect verify.
    # Replicas prefix EVERY token with a digit-safe replica tag
    # (regexp on the word boundary; letters past 'Z' would hit regex
    # replacement metachars like backslash at mult>=28), so replica shingle vocabularies are disjoint:
    # no cross-replica candidate pairs, near-dup structure replicates
    # instead of densifying, and both the vocabulary (freq join build)
    # and the pair volume scale linearly by construction.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if sf_dir + "/docs" not in _BASE_COUNTS:
        _BASE_COUNTS[sf_dir + "/docs"] = (docs.count(), 0)
    n_docs = _BASE_COUNTS[sf_dir + "/docs"][0]
    doc_reps = [
        docs.select(
            (F.col("doc_id") + F.lit(r * SHIFT)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"R{r}x$1").alias("text"),
        )
        for r in range(mult)
    ]
    docs_m = doc_reps[0]
    for rep in doc_reps[1:]:
        docs_m = docs_m.unionByName(rep)

    def jaccard_verify_compute() -> None:
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import (
            jaccard_prefix_filtered_pairs,
        )

        jaccard_prefix_filtered_pairs(docs_m, k=3, threshold=0.5).write.format(
            "noop"
        ).mode("overwrite").save()

    # Hybrid RRF retrieval at amplified corpus. Replicas copy texts
    # VERBATIM (doc_id shift only), so query-term posting lists grow
    # x mult — the honest worst case for the sparse half (the tf/df
    # index build is corpus-linear by nature; production amortizes it
    # across queries). Embeddings amplify by vec_id shift; the anchors
    # stay in replica 0 and the dense brute-force scorer scans the full
    # amplified corpus — at production scale that half swaps for the
    # stored-IVF serving path (ivf_served, sublinear above). The point
    # this probe pins: FUSION cost stays flat — its full outer join
    # inputs are <= 20 rows per query at every mult, so the end-to-end
    # slope is exactly the sum of the two rankers' own slopes.
    docs_plain_m = amplify(docs_full, mult, ["doc_id"])
    embs_r = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if sf_dir + "/embs_r" not in _BASE_COUNTS:
        _BASE_COUNTS[sf_dir + "/embs_r"] = (embs_r.count(), 0)
    n_embs_r = _BASE_COUNTS[sf_dir + "/embs_r"][0]
    embs_m = amplify(embs_r, mult, ["vec_id"])

    def hybrid_rrf_compute() -> None:
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
            retrieval_hybrid_rrf,
        )

        retrieval_hybrid_rrf(
            spark, sf_dir, docs=docs_plain_m, embs=embs_m
        ).write.format("noop").mode("overwrite").save()

    # --- stored BM25 serving (r11): build the (segment, term-bucket)
    # partitioned inverted index once per (sf, mult) UNTIMED (prior
    # nights' output), then time SERVING alone — the pruned posting
    # read + df/stats joins + scoring. Serving cost must track the
    # query terms' posting-list lengths (which grow with the corpus),
    # never corpus tokenization.
    bm25_served_compute = None
    if want("bm25_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
            _BM25_QUERIES,
            _BM25_TB,
            _bm25_index_root,
            _bm25_scores_served,
            _term_bucket_py,
        )

        bm_key = (sf_dir, mult, "bm25")
        if bm_key not in _SIG_STORES:
            root = _bm25_index_root(
                spark,
                amplify(docs_full, mult, ["doc_id"]),
                f"probe_bm25_m{mult}",
            )
            buckets = sorted(
                {_term_bucket_py(t) for _, ts in _BM25_QUERIES for t in ts}
            )
            full_files = len(
                read_versioned_table(spark, f"{root}/postings").inputFiles()
            )
            pruned_files = len(
                read_versioned_table(
                    spark, f"{root}/postings", partition_filter={"tb": buckets}
                ).inputFiles()
            )
            print(
                f"bm25_served mult={mult}: query buckets {len(buckets)}/{_BM25_TB}, "
                f"posting files {full_files} -> {pruned_files} after manifest pruning"
            )
            _SIG_STORES[bm_key] = root
        bm25_root = _SIG_STORES[bm_key]

        def bm25_served_compute() -> None:
            _bm25_scores_served(spark, bm25_root).write.format("noop").mode(
                "overwrite"
            ).save()

    # --- nightly corpus factory (r11): the HISTORIC corpus scales with
    # mult but lives only in the content store (built untimed); the
    # BATCH is CONSTANT (the base fixture's doc_id % 5 = 0 slice). The
    # timed nightly = batch prep + atomic MERGE + verdicts/packing from
    # the post-merge snapshot — its slope over mult is the store-read
    # slope, NOT a historic re-prep (which would scale linearly).
    factory_nightly_compute = None
    if want("factory_nightly"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            factory_nightly_batch,
            factory_store_build,
        )

        fa_key = (sf_dir, mult, "factory")
        if fa_key not in _SIG_STORES:
            hist_m = amplify(
                docs_full.where(F.col("doc_id") % 5 != 0), mult, ["doc_id"]
            )
            _SIG_STORES[fa_key] = factory_store_build(
                spark, hist_m, f"probe_factory_m{mult}"
            )
        factory_table = _SIG_STORES[fa_key]
        factory_batch = docs_full.where(F.col("doc_id") % 5 == 0)

        def factory_nightly_compute() -> None:
            factory_nightly_batch(
                spark, factory_batch, factory_table
            ).write.format("noop").mode("overwrite").save()

    # --- MULTIMODAL nightly factory (r12, verdict ask #1): the
    # factory_nightly shape with the store carrying (fp, n_words,
    # dhash, asig) — the timed nightly pays image+audio DECODE for the
    # CONSTANT batch only, plus batch-restricted pair generation over
    # the snapshot and an O(1) stats read for the pack base (the text
    # factory's nightly hist ownership re-scan would have been a
    # historic PAIR recompute here, so the base is stored). n_patterns
    # scales WITH mult (the r7 image-probe trick: constant near-dup
    # cluster sizes — a fixed pattern count would densify clusters and
    # measure the fixture's quadratic pair growth, not the plan).
    factory_mm_compute = None
    if want("factory_multimodal"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            factory_multimodal_nightly,
            factory_multimodal_store_build,
        )

        # big-binary mapInPandas stages cap the Arrow batch (the r11
        # off-heap OOM lesson; decode stages size batches to payloads)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        fm_key = (sf_dir, mult, "factory_mm")
        if fm_key not in _SIG_STORES:
            hist_m = amplify(
                docs_full.where(F.col("doc_id") % 5 != 0), mult, ["doc_id"]
            )
            _SIG_STORES[fm_key] = factory_multimodal_store_build(
                spark, hist_m, f"probe_factory_mm_m{mult}", n_patterns=37 * mult
            )
        fm_root = _SIG_STORES[fm_key]
        fm_batch = docs_full.where(F.col("doc_id") % 5 == 0)

        def factory_mm_compute() -> None:
            factory_multimodal_nightly(
                spark, fm_batch, fm_root, n_patterns=37 * mult
            ).write.format("noop").mode("overwrite").save()

    # --- composed hybrid serving ALONE (r11 verdict ask #3): both
    # stored halves — the (seg, tb)-partitioned BM25 posting lists and
    # the cid-partitioned IVF inverted file — built + nightly-merged
    # once per (sf, mult), UNTIMED; the timed run is
    # hybrid_rrf_served_from_roots: query-term bucket pruning + probed
    # cell pruning (both at the manifest) + pool-bounded RRF fusion in
    # one query. Construction prints BOTH prunings' file counts.
    hybrid_served_compute = None
    if want("hybrid_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
            _BM25_QUERIES,
            _bm25_index_root,
            _hybrid_dense_index_root,
            _term_bucket_py,
            hybrid_rrf_served_from_roots,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
            ivf_probed_cells as _hyb_probed,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            _IVF_FIXED_CENTROIDS as _HYB_CENTS,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
            _RRF_ANCHORS as _HYB_ANCHORS,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
            read_versioned_table,
        )

        embs_h = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if sf_dir + "/embs" not in _BASE_COUNTS:
            _BASE_COUNTS[sf_dir + "/embs"] = (embs_h.count(), 0)
        n_embs_h = _BASE_COUNTS[sf_dir + "/embs"][0]
        embs_hm = amplify(embs_h, mult, ["vec_id"])
        hs_key = (sf_dir, mult, "hybrid_served")
        if hs_key not in _SIG_STORES:
            sroot = _bm25_index_root(
                spark, amplify(docs_full, mult, ["doc_id"]), f"probe_hyb_bm25_m{mult}"
            )
            droot = _hybrid_dense_index_root(
                spark, embs_hm, f"probe_hyb_ivf_m{mult}"
            )
            buckets = sorted(
                {_term_bucket_py(t) for _, ts in _BM25_QUERIES for t in ts}
            )
            p_full = len(
                read_versioned_table(spark, f"{sroot}/postings").inputFiles()
            )
            p_pruned = len(
                read_versioned_table(
                    spark, f"{sroot}/postings", partition_filter={"tb": buckets}
                ).inputFiles()
            )
            qv = embs_hm.where(
                F.col("vec_id").isin([v for _, v in _HYB_ANCHORS])
            )
            cells = _hyb_probed(qv, centroids=_HYB_CENTS, n_probe=2)
            c_full = len(
                read_versioned_table(spark, f"{droot}/cells").inputFiles()
            )
            c_pruned = len(
                read_versioned_table(
                    spark, f"{droot}/cells", partition_filter={"cid": cells}
                ).inputFiles()
            )
            print(
                f"hybrid_served mult={mult}: posting files {p_full} -> "
                f"{p_pruned}, cell files {c_full} -> {c_pruned} after "
                f"manifest pruning"
            )
            _SIG_STORES[hs_key] = (sroot, droot)
        hs_sroot, hs_droot = _SIG_STORES[hs_key]

        def hybrid_served_compute() -> None:
            hybrid_rrf_served_from_roots(
                spark, hs_sroot, hs_droot, embs_hm
            ).write.format("noop").mode("overwrite").save()

    # --- reweighted IVFADC serving ALONE (r12): the trained model and
    # codebooks are PRIOR artifacts (yesterday's training run) and the
    # packed-pair inverted file is prior nights' index maintenance —
    # all built once per (sf, mult), untimed. The timed serve = the
    # per-query reweighted table construction (queries x 256 codebook
    # rows, corpus-independent) + manifest-pruned packed read + nibble
    # unpack + table join + top-k: cost tracks the probed cells'
    # candidate count (2 of 8 cells => ~1/4 of packed rows at 24
    # B/vector), never a float-vector read.
    rw_ivfpq_served_compute = None
    if want("rw_ivfpq_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
            ivf_pq_reweighted_packed_topk_adc,
            ivf_probed_cells as _rw_probed,
            normalized_embeddings,
            pq_packed_pair_inverted_file,
            train_pq_codebooks,
            train_triplet_reweighter,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.indexes import (
            IncrementalIndexStore,
            fresh_index_root,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
            read_versioned_table as _rw_read,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            _HARDNEG_DUP_T,
            _HARDNEG_K,
            _IVF_FIXED_CENTROIDS,
            _RW_PQ_CODES,
            _RW_PQ_ITERS,
            _RW_PQ_NSUB,
            _TRIP_DIM,
            _TRIP_EPOCHS,
            _TRIP_LR,
            _TRIP_MARGIN,
        )

        embs_w = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if sf_dir + "/embs" not in _BASE_COUNTS:
            _BASE_COUNTS[sf_dir + "/embs"] = (embs_w.count(), 0)
        n_embs_w = _BASE_COUNTS[sf_dir + "/embs"][0]
        rw_key = (sf_dir, mult, "rw_ivfpq")
        if rw_key not in _IVF_STORES:
            en_m = normalized_embeddings(amplify(embs_w, mult, ["vec_id"]))
            # the model + codebooks are trained on the BASE corpus
            # (yesterday's artifacts, corpus-size-independent); the
            # index encodes the full amplified corpus with them
            w = train_triplet_reweighter(
                embs_w,
                embs_w.where(F.col("vec_id") % 50 == 0),
                k=_HARDNEG_K,
                dup_threshold=_HARDNEG_DUP_T,
                margin=_TRIP_MARGIN,
                lr=_TRIP_LR,
                epochs=_TRIP_EPOCHS,
                dim=_TRIP_DIM,
            ).localCheckpoint(eager=True)
            books = train_pq_codebooks(
                normalized_embeddings(embs_w),
                vec_col="u",
                n_subspaces=_RW_PQ_NSUB,
                n_codes=_RW_PQ_CODES,
                iters=_RW_PQ_ITERS,
            )
            root = fresh_index_root(f"probe_rw_ivfpq_m{mult}")
            IncrementalIndexStore(
                spark, f"{root}/cells", keys=["vec_id"], partition_by=["cid"]
            ).build(
                pq_packed_pair_inverted_file(
                    en_m,
                    vec_col="u",
                    centroids=_IVF_FIXED_CENTROIDS,
                    codebooks=books,
                )
            )
            # 3 queries, not the registered 10: at 8 coarse cells the
            # 10-query batch probes every cell and pruning has nothing
            # to drop (the ivf_served probe's regime note) — the probe
            # measures the pruned path's PAYOFF, not just correctness
            qn = en_m.where(F.col("vec_id") < 3).localCheckpoint(eager=True)
            cells = _rw_probed(
                qn, vec_col="u", centroids=_IVF_FIXED_CENTROIDS, n_probe=2
            )
            full_f = len(_rw_read(spark, f"{root}/cells").inputFiles())
            pruned_f = len(
                _rw_read(
                    spark, f"{root}/cells", partition_filter={"cid": cells}
                ).inputFiles()
            )
            print(
                f"rw_ivfpq_served mult={mult}: probed {len(cells)}/8 cells, "
                f"index files {full_f} -> {pruned_f} after manifest pruning"
            )
            _IVF_STORES[rw_key] = (root, books, w, qn, cells)
        rw_root, rw_books, rw_w, rw_qn, rw_cells = _IVF_STORES[rw_key]

        def rw_ivfpq_served_compute() -> None:
            inv = _rw_read(
                spark, f"{rw_root}/cells", partition_filter={"cid": rw_cells}
            )
            ivf_pq_reweighted_packed_topk_adc(
                inv,
                rw_qn,
                rw_w,
                centroids=_IVF_FIXED_CENTROIDS,
                codebooks=rw_books,
                k=5,
                n_probe=2,
            ).write.format("noop").mode("overwrite").save()

    # --- reweighted-IVFADC served from RETRAINED coarse cells -------
    # The r13 tier (ann_topk_reweighted_ivfpq_retrained) partitions
    # the packed store by cells CLUSTERED UNDER w^2 instead of the
    # unweighted gauss centroids. The scale question this probe
    # answers is occupancy SKEW: a w^2 retrain is free to collapse
    # most of the corpus into few cells, and a skewed store erodes
    # manifest pruning's payoff (probing 2 of 8 cells only drops
    # ~3/4 of the packed bytes if cells stay balanced). So the build
    # step PRINTS the stored per-cell occupancy histogram at every
    # mult, and the timed serve is the same shape as rw_ivfpq_served:
    # per-query reweighted tables + manifest-pruned packed read +
    # nibble unpack + table join + top-k, probing by the asymmetric
    # serving-score rule. Model, codebooks AND retrained centroids
    # all train on the BASE corpus (yesterday's artifacts,
    # corpus-size-independent); the index encodes the amplified
    # corpus with them.
    rw_rt_served_compute = None
    if want("rw_ivfpq_rt_served"):
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
            assign_w2_cells,
            ivf_pq_reweighted_packed_topk_adc as _rt_adc,
            normalized_embeddings as _rt_norm,
            pq_packed_pair_inverted_file as _rt_pack,
            probe_reweighted_cells,
            train_ivf_centroids_reweighted,
            train_pq_codebooks as _rt_books,
            train_triplet_reweighter as _rt_train,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.indexes import (
            IncrementalIndexStore as _RtStore,
            fresh_index_root as _rt_root,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
            read_versioned_table as _rt_read,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            _HARDNEG_DUP_T,
            _HARDNEG_K,
            _IVF_FIXED_CENTROIDS,
            _RW_IVF_RETRAIN_K,
            _RW_PQ_CODES,
            _RW_PQ_ITERS,
            _RW_PQ_NSUB,
            _TRIP_DIM,
            _TRIP_EPOCHS,
            _TRIP_LR,
            _TRIP_MARGIN,
        )

        embs_rt = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        if sf_dir + "/embs" not in _BASE_COUNTS:
            _BASE_COUNTS[sf_dir + "/embs"] = (embs_rt.count(), 0)
        n_embs_rt = _BASE_COUNTS[sf_dir + "/embs"][0]
        rt_key = (sf_dir, mult, "rw_ivfpq_rt")
        if rt_key not in _IVF_STORES:
            w = _rt_train(
                embs_rt,
                embs_rt.where(F.col("vec_id") % 50 == 0),
                k=_HARDNEG_K,
                dup_threshold=_HARDNEG_DUP_T,
                margin=_TRIP_MARGIN,
                lr=_TRIP_LR,
                epochs=_TRIP_EPOCHS,
                dim=_TRIP_DIM,
            ).localCheckpoint(eager=True)
            en_b = _rt_norm(embs_rt)
            books = _rt_books(
                en_b,
                vec_col="u",
                n_subspaces=_RW_PQ_NSUB,
                n_codes=_RW_PQ_CODES,
                iters=_RW_PQ_ITERS,
            )
            cents_rt = train_ivf_centroids_reweighted(
                en_b, w, n_centroids=_RW_IVF_RETRAIN_K, iters=1
            )
            en_m = _rt_norm(amplify(embs_rt, mult, ["vec_id"]))
            packed = _rt_pack(
                en_m,
                vec_col="u",
                centroids=_IVF_FIXED_CENTROIDS,
                codebooks=books,
            ).drop("cid")
            cid_rt = assign_w2_cells(en_m, w, centroids=cents_rt)
            root = _rt_root(f"probe_rw_ivfpq_rt_m{mult}")
            store = _RtStore(
                spark, f"{root}/cells", keys=["vec_id"], partition_by=["cid"]
            ).build(packed.join(cid_rt, "vec_id"))
            occ = {
                int(r["cid"]): int(r["n"])
                for r in store.serve()
                .groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            qn = en_m.where(F.col("vec_id") < 3).localCheckpoint(eager=True)
            qcells = probe_reweighted_cells(
                qn, w, centroids=cents_rt, n_probe=2
            ).localCheckpoint(eager=True)
            cells = sorted(
                int(r["cid"]) for r in qcells.select("cid").distinct().collect()
            )
            full_f = len(_rt_read(spark, f"{root}/cells").inputFiles())
            pruned_f = len(
                _rt_read(
                    spark, f"{root}/cells", partition_filter={"cid": cells}
                ).inputFiles()
            )
            tot = sum(occ.values())
            probed_rows = sum(occ.get(c, 0) for c in cells)
            print(
                f"rw_ivfpq_rt_served mult={mult}: retrained-cell occupancy "
                f"{[occ.get(c, 0) for c in range(_RW_IVF_RETRAIN_K)]} "
                f"(probing {len(cells)}/{_RW_IVF_RETRAIN_K} cells = "
                f"{probed_rows}/{tot} rows), index files "
                f"{full_f} -> {pruned_f} after manifest pruning"
            )
            _IVF_STORES[rt_key] = (root, books, w, qn, cells, cents_rt, qcells)
        rt_root, rt_books_v, rt_w, rt_qn, rt_cells, rt_cents, rt_qcells = (
            _IVF_STORES[rt_key]
        )

        def rw_rt_served_compute() -> None:
            inv = _rt_read(
                spark, f"{rt_root}/cells", partition_filter={"cid": rt_cells}
            )
            _rt_adc(
                inv,
                rt_qn,
                rt_w,
                centroids=rt_cents,
                codebooks=rt_books_v,
                k=5,
                n_probe=2,
                query_cells=rt_qcells.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("cid").alias("__cell"),
                ),
            ).write.format("noop").mode("overwrite").save()

    served = {}
    if factory_mm_compute is not None:
        served["factory_multimodal"] = (factory_mm_compute, n_docs * mult)
    if hybrid_served_compute is not None:
        served["hybrid_served"] = (hybrid_served_compute, (n_docs + n_embs_h) * mult)
    if rw_ivfpq_served_compute is not None:
        served["rw_ivfpq_served"] = (rw_ivfpq_served_compute, n_embs_w * mult)
    if rw_rt_served_compute is not None:
        served["rw_ivfpq_rt_served"] = (rw_rt_served_compute, n_embs_rt * mult)
    if bm25_served_compute is not None:
        served["bm25_served"] = (bm25_served_compute, n_docs * mult)
    if factory_nightly_compute is not None:
        # rows metric = stored corpus size (what the slope is against)
        served["factory_nightly"] = (factory_nightly_compute, n_docs * mult)
    if image_served_compute is not None:
        served["image_served"] = (image_served_compute, n_docs_i * mult)
    if audio_served_compute is not None:
        served["audio_served"] = (audio_served_compute, n_docs_i * mult)
    if image_served_mb_compute is not None:
        served["image_served_mb"] = (image_served_mb_compute, n_docs_i * mult)
    if image_incr_mb_compute is not None:
        served["image_incr_mb"] = (image_incr_mb_compute, n_docs_i * mult)
    if ivf_served_compute is not None:
        served["ivf_served"] = (ivf_served_compute, n_embs * mult)
    if ivfpq_served_compute is not None:
        served["ivfpq_served"] = (ivfpq_served_compute, n_embs * mult)
    return served | {
        "scan_agg": (agg, n_li * mult),
        "window_top1": (topn, n_li * mult),
        "shuffle_join_agg": (join, (n_li + n_o) * mult),
        "pair_generation": (pair_gen, n_li * mult),
        "graph_rank_iter": (rank_iter, (n_li + n_o) * mult),
        "recsys_cooccur": (recsys, (n_li + n_o) * mult),
        "triangle_count": (triangles, n_li * mult),
        "triangle_count_approx": (triangles_approx, n_li * mult),
        "consume_e2e_compute": (e2e_compute, n_ev * mult),
        "consume_e2e_staged": (e2e_staged, n_ev * mult),
        "kcore_peel": (kcore_compute, n_li * mult),
        "image_dedup": (image_dedup_compute, n_docs_i * mult),
        "image_dedup_k3": (image_dedup_k3_compute, n_docs_i * mult),
        "image_pipeline_k3": (image_pipeline_k3_compute, n_docs_i * mult),
        "audio_dedup": (audio_dedup_compute, n_docs_i * mult),
        "multimodal_summary": (multimodal_summary_compute, n_docs_i * mult),
        "image_incr": (image_incr_compute, n_docs_i * mult),
        "audio_incr": (audio_incr_compute, n_docs_i * mult),
        "web_corpus_prep": (web_prep, n_docs_i * mult),
        "fuzzy_er_closure": (fuzzy_er_compute, n_cust * mult),
        "fuzzy_k2": (fuzzy_k2_compute, n_cust * mult),
        "jaccard_verify": (jaccard_verify_compute, n_docs * mult),
        "hybrid_rrf": (hybrid_rrf_compute, (n_docs + n_embs_r) * mult),
    }


def plan_audits(spark: SparkSession, sf_dir: str, mult: int) -> dict[str, object]:
    """Executed-plan assertions at amplified scale (r5 review ask #4):
    the mis-broadcast class regresses SILENTLY if an estimate path
    changes, so the probe sweep re-proves the load-bearing plan facts
    on the FINAL adaptive plan at the largest mult, not just in the
    fixture-scale pytest suite. Each audit runs the plan to completion
    (AQE finalizes only on execution), inspects the final plan, and
    raises on violation."""

    def final_plan(df) -> str:
        # a 1-row global aggregate executes every join/exchange of the
        # underlying plan inside THIS DataFrame's query execution, so
        # the AdaptiveSparkPlan it holds afterwards is the final one.
        # It must hash EVERY column (not count(*)): a count-only plan
        # lets Catalyst's outer-join elimination prune non-duplicating
        # left joins, so the audit would run against a plan missing
        # joins the real query still executes (r6 ADVICE).
        counted = (
            df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h"))
            .groupBy()
            .agg(F.count("__h").alias("n"), F.sum("__h").alias("s"))
        )
        counted.collect()
        return (
            counted._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )

    def assert_no_checkpoint_broadcasts(plan: str, who: str) -> None:
        # the r6 detector, applied to the FINAL adaptive plan at the
        # largest mult: a broadcast build over a bare checkpoint scan
        # is the non-demotable mis-broadcast class (SCALE.md round 6).
        # The executed-plan string is tree-only (no detail section), so
        # the detector's tree-section split is a no-op here.
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "explain_audit", Path(__file__).resolve().parent / "explain_audit.py"
        )
        ea = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ea)
        flags = ea.checkpoint_broadcast_flags(plan)
        assert not flags, (
            f"{who}: bare checkpoint-scan broadcast build(s) in the final "
            f"plan at mult={mult}: {flags}"
        )

    def fuzzy_er_round_join_stays_smj() -> None:
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.fuzzy import (
            fuzzy_self_pairs,
        )

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_name")
        reps = [
            cust.select(
                F.concat(F.lit(chr(65 + r) * 2), F.col("c_name")).alias("c_name")
            )
            for r in range(mult)
        ]
        cust_m = reps[0]
        for rep in reps[1:]:
            cust_m = cust_m.unionByName(rep)
        pairs = (
            fuzzy_self_pairs(cust_m, "c_name", max_variant_freq=256)
            .select(F.col("name_a").alias("src"), F.col("name_b").alias("dst"))
            .localCheckpoint(eager=True)
        )
        # one closure round, exactly as connected_components builds it:
        # the checkpointed edge list inherits the explode-underestimate,
        # so an unpinned join is where AQE would broadcast data
        sym = pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        rj = sym.hint("merge").join(labels.withColumnRenamed("node", "dst"), on="dst")
        try:
            plan = final_plan(rj)
        finally:
            pairs.unpersist()  # 64x checkpoint blocks outlive the fn otherwise
        assert "SortMergeJoin" in plan, "closure round join lost its SMJ pin"
        assert "BroadcastHashJoin" not in plan, (
            "closure round join broadcasts a data-sized side at "
            f"mult={mult} — the r5 mis-broadcast class is back"
        )
        assert_no_checkpoint_broadcasts(plan, "fuzzy_er_closure")

    def consume_e2e_no_data_sized_broadcast() -> None:
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.pipelines.consume_batch import (
            consume_batch,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.consume_e2e import (
            _DATES,
            derive_consume_inputs,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev_m = amplify(ev, mult, ["event_id", "user_id"])
        t = derive_consume_inputs(spark, sf_dir, events=ev_m)
        df = consume_batch(
            t["changelog"], t["texts"], t["visibility"], t["fraud"],
            t["contacts"], t["visits"], t["bundeslaender"], t["stadtlandkreise"],
            _DATES,
            stage0_mode="cached",
            materialize=True,
        )
        try:
            plan = final_plan(df)
        finally:
            spark.catalog.clearCache()  # consume_batch caches its stage-0 merge
        assert "CartesianProduct" not in plan, "e2e grew an unguarded cross join"
        assert "BroadcastNestedLoopJoin" not in plan, (
            "e2e grew a nested-loop join — a non-equi condition stopped "
            "planning as hash/merge"
        )
        assert_no_checkpoint_broadcasts(plan, "consume_e2e_compute")

    def consume_e2e_staged_scans_parquet() -> None:
        import os
        import shutil
        import tempfile

        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.pipelines.consume_batch import (
            consume_batch,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.consume_e2e import (
            _DATES,
            derive_consume_inputs,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev_m = amplify(ev, mult, ["event_id", "user_id"])
        t = derive_consume_inputs(spark, sf_dir, events=ev_m)
        staging = os.path.join(tempfile.gettempdir(), "spark_graft_audit_stage0")
        shutil.rmtree(staging, ignore_errors=True)
        try:
            df = consume_batch(
                t["changelog"], t["texts"], t["visibility"], t["fraud"],
                t["contacts"], t["visits"], t["bundeslaender"], t["stadtlandkreise"],
                _DATES,
                stage0_staging=staging,
            )
            plan = final_plan(df)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        # staging mode must never fall back to the cache tier, and the
        # staged scan must stay join-safe like the cached plan
        assert "InMemoryTableScan" not in plan, "staged e2e still reads the cache"
        assert "Scan parquet" in plan, "staged e2e lost its parquet scan"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "consume_e2e_staged")

    def jaccard_verify_pins_hold() -> None:
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import (
            jaccard_prefix_filtered_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        doc_reps = [
            docs.select(
                (F.col("doc_id") + F.lit(r * SHIFT)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"R{r}x$1").alias("text"),
            )
            for r in range(mult)
        ]
        docs_m = doc_reps[0]
        for rep in doc_reps[1:]:
            docs_m = docs_m.unionByName(rep)
        plan = final_plan(jaccard_prefix_filtered_pairs(docs_m, k=3, threshold=0.5))
        assert "SortMergeJoin" in plan, "verify joins lost their merge pins"
        assert_no_checkpoint_broadcasts(plan, "jaccard_verify")

    def recsys_topk_stays_grouped() -> None:
        # the co-occurrence spine (r6 review ask #7): per-basket pair
        # generation must stay the grouped-bucket shape (no self-join of
        # the basket table), the top-k must keep its partial
        # WindowGroupLimit below the shuffle, and nothing data-sized may
        # broadcast. Rebuild the probe's own DF at the audit mult.
        recsys_df, _ = probes(spark, sf_dir, mult, {"recsys_cooccur"})["recsys_cooccur"]
        plan = final_plan(recsys_df)
        assert "WindowGroupLimit" in plan, "top-k lost its partial group limit"
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "recsys_cooccur")

    def kcore_round_join_stays_smj() -> None:
        # one peel round exactly as kcore_peel builds it, from a
        # checkpointed explode-generated edge list (the bogus-estimate
        # lineage): both keep-set joins must hold their merge pins —
        # the keep-set is near node-sized in round 1, and a broadcast
        # off the inherited underestimate is the 100-TB OOM class.
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.dedup import (
            _bucket_pairs,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li_m = amplify(li, mult, ["l_orderkey"])
        li_t = (
            li_m.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("doc"))
            .distinct()
        )
        und = (
            _bucket_pairs(li_t, "o", distinct_pairs=False)
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("ns"))
            .where(F.col("ns") >= 2)
        )
        e = (
            und.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            .union(und.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
            .localCheckpoint(eager=True)
        )
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .where(F.col("__deg") >= 3)
            .select(F.col("src").alias("__node"))
        )
        rj = e.join(keep.select(F.col("__node").alias("src")).hint("merge"), "src").join(
            keep.select(F.col("__node").alias("dst")).hint("merge"), "dst"
        )
        try:
            plan = final_plan(rj)
        finally:
            e.unpersist()
        assert "SortMergeJoin" in plan, "peel round join lost its merge pin"
        assert "BroadcastHashJoin" not in plan, (
            f"peel round broadcasts a data-sized keep-set at mult={mult}"
        )
        assert_no_checkpoint_broadcasts(plan, "kcore_peel")

    def fuzzy_k2_stays_grouped_no_join() -> None:
        # the k=2 blocking generates pairs from GROUPED variant buckets
        # (explode -> groupBy(variant) -> upper triangle), deliberately
        # NOT a variant self-join: the audit pins that shape at the
        # largest mult — no join operator of any kind may appear (a
        # rewrite to a self-join would re-explode the neighborhood
        # twice and hand AQE a broadcastable mis-estimated side), and
        # no broadcast exchange may appear over the exploded variants
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.fuzzy import (
            fuzzy_self_pairs,
        )

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_name")
        reps3 = [
            cust.select(
                F.concat(F.lit(chr(65 + r) * 3), F.col("c_name")).alias("c_name")
            )
            for r in range(mult)
        ]
        cust_m3 = reps3[0]
        for rep in reps3[1:]:
            cust_m3 = cust_m3.unionByName(rep)
        df = fuzzy_self_pairs(cust_m3, "c_name", max_distance=2).select(
            "name_a", "name_b", "dist"
        )
        plan = final_plan(df)
        for join_node in (
            "SortMergeJoin",
            "BroadcastHashJoin",
            "ShuffledHashJoin",
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
        ):
            assert join_node not in plan, (
                f"fuzzy_k2 grew a {join_node} at mult={mult} — the grouped-"
                "bucket pair generation degraded to a join"
            )
        assert "BroadcastExchange" not in plan, (
            f"fuzzy_k2 broadcasts at mult={mult} — nothing in this plan "
            "is model-sized"
        )

    def image_pipeline_k3_pins_hold() -> None:
        # the COMPOSED wide-block pipeline at the audit mult: on top of
        # the pair-stage pins (image_dedup_k3_pins_hold), the connected-
        # components rounds join checkpointed frontier edges against
        # label sets — the same non-demotable checkpoint-broadcast class
        # as kcore/fuzzy closures — and the survivor join must stay
        # data-shaped (no cartesian/BNLJ)
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            image_dedup_pipeline,
        )

        docs_a = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
            mult,
            ["doc_id"],
        )
        plan = final_plan(image_dedup_pipeline(docs_a, n_patterns=37 * mult))
        assert "SortMergeJoin" in plan, "image pipeline joins lost their merge pins"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "image_pipeline_k3")

    def audio_dedup_pins_hold() -> None:
        # the audio chain's signature checkpoint feeds blocking AND both
        # verify sides (the shared hamming_verified_pairs tail), then
        # the CC closure — identical hazard profile to the image
        # pipeline, audited on its own plan because the signature is
        # built from a window aggregate (different estimate path)
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            audio_dedup_pipeline,
        )

        docs_a = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
            mult,
            ["doc_id"],
        )
        plan = final_plan(audio_dedup_pipeline(docs_a, n_patterns=37 * mult))
        assert "SortMergeJoin" in plan, "audio pipeline joins lost their merge pins"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "audio_dedup")

    def multimodal_summary_pins_hold() -> None:
        # the cross-modal composition: both modality chains keep their
        # audited shapes AND the three-way verdict join of doc-sized
        # honest-estimate sides stays hash/merge-planned (r8 verdict
        # ask #8 — confirm the summary join adds no hazard class)
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            multimodal_dedup_summary,
        )

        docs_a = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"),
            mult,
            ["doc_id"],
        )
        plan = final_plan(multimodal_dedup_summary(docs_a, n_patterns=37 * mult))
        assert "SortMergeJoin" in plan, "multimodal chains lost their merge pins"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "multimodal_summary")

    def factory_nightly_pins_hold() -> None:
        # the nightly corpus-factory serve at the audit mult: the
        # batch's verdict/packing joins ride checkpointed (batch) and
        # store-derived (fingerprint) sides — both data-sized at a
        # real night — so the merge pins must hold and no broadcast
        # may build over a bare checkpoint scan. The 1-row base
        # crossJoin is the only BroadcastNestedLoopJoin allowed.
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            factory_nightly_batch,
            factory_store_build,
        )

        docs_f = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        hist_m = amplify(docs_f.where(F.col("doc_id") % 5 != 0), mult, ["doc_id"])
        table = factory_store_build(spark, hist_m, f"audit_factory_m{mult}")
        plan = final_plan(
            factory_nightly_batch(spark, docs_f.where(F.col("doc_id") % 5 == 0), table)
        )
        assert "SortMergeJoin" in plan, "factory verdict joins lost their merge pins"
        assert "CartesianProduct" not in plan
        # exactly the 1-row base broadcast may plan as a nested loop
        assert plan.count("BroadcastNestedLoopJoin") <= 1, (
            "factory grew an unguarded nested-loop join beyond the 1-row base"
        )
        assert_no_checkpoint_broadcasts(plan, "factory_nightly")

    def image_served_plan_is_parquet_fed() -> None:
        # the nightly serve at the audit mult: after the batch MERGE,
        # the pair plan must be fed by PARQUET SCANS of the signature
        # table — zero python decode stages (a MapInPandas anywhere
        # below the pair tail means historic payloads are being
        # re-decoded at query time, the exact weakness the served
        # design closes) — and the verify joins must keep their pins
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
            merge_versioned_table,
            read_versioned_table,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            hamming_verified_pairs,
            image_dhash_signatures,
        )

        probes(spark, sf_dir, mult, {"image_served"})  # store at this mult
        table = _SIG_STORES[("image", sf_dir, mult)]
        docs_a = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
            mult,
            ["doc_id"],
        )
        batch = image_dhash_signatures(
            docs_a.where(f"doc_id % {5 * mult} = 0"), n_patterns=37 * mult
        )
        merge_versioned_table(
            spark,
            table,
            batch.withColumn("ingest_bucket", F.lit(1)),
            keys=["doc_id"],
            partition_by=["ingest_bucket"],
        )
        sigs = read_versioned_table(spark, table)
        df = hamming_verified_pairs(
            sigs.select("doc_id", "dhash"),
            "dhash",
            band_hex_width=4,
            max_hamming=3,
            pair_filter_sql=f"x % {5 * mult} = 0 OR y % {5 * mult} = 0",
        )
        plan = final_plan(df)
        assert "Scan parquet" in plan, "served pairs lost their parquet scan"
        for py_node in ("MapInPandas", "ArrowEval", "BatchEvalPython"):
            assert py_node not in plan, (
                f"served pair plan contains {py_node} at mult={mult} — "
                "historic payloads re-decoded at query time"
            )
        assert "SortMergeJoin" in plan, "served verify joins lost their pins"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "image_served")

    def ivf_served_no_corpus_side() -> None:
        # serving from the pruned inverted file must stay
        # self-contained: parquet scans of the index only (the query
        # side's tiny UDF explode is expected — 3 rows), no cartesian /
        # nested-loop, and the candidate join keyed on the cell id
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
            ivf_probed_cells,
            ivf_topk_from_inverted_file,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
            read_versioned_table,
        )

        probes(spark, sf_dir, mult, {"ivf_served"})  # index at this mult
        root, cents = _IVF_STORES[(sf_dir, mult)]
        embs_m = amplify(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), mult, ["vec_id"]
        )
        queries = embs_m.where(F.col("vec_id") < 3)
        cells = ivf_probed_cells(queries, centroids=cents, n_probe=2)
        inv = read_versioned_table(
            spark, f"{root}/cells", partition_filter={"cid": cells}
        )
        pruned_files = len(inv.inputFiles())
        full_files = len(read_versioned_table(spark, f"{root}/cells").inputFiles())
        assert pruned_files < full_files, (
            f"manifest pruning read {pruned_files}/{full_files} files at "
            f"mult={mult} — nothing was pruned"
        )
        plan = final_plan(
            ivf_topk_from_inverted_file(inv, queries, centroids=cents, k=5, n_probe=2)
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "WindowGroupLimit" in plan, "IVF top-k lost its partial group limit"

    def incr_pair_filter_inside_generation() -> None:
        # the incremental twins must keep the batch restriction INSIDE
        # grouped-bucket pair generation — a Filter above a Generate,
        # never a join against a batch table (the dedup_incremental_
        # minhash contract, now on the Hamming path)
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            image_dhash_verified_pairs,
        )

        docs_a = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
            mult,
            ["doc_id"],
        )
        plan = final_plan(
            image_dhash_verified_pairs(
                docs_a,
                n_patterns=37 * mult,
                band_hex_width=4,
                max_hamming=3,
                pair_filter_sql=f"x % {5 * mult} = 0 OR y % {5 * mult} = 0",
            )
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "image_incr")

    def image_dedup_k3_pins_hold() -> None:
        # the wide-block scale path at the audit mult: the dHash
        # signature checkpoint feeds blocking AND both verify sides, so
        # the verify joins must keep their merge pins (bare checkpoint
        # scan = non-demotable broadcast class), and the banding must
        # never degrade to a cartesian
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            image_dhash_verified_pairs,
        )

        docs_a = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"),
            mult,
            ["doc_id"],
        )
        df = image_dhash_verified_pairs(
            docs_a, n_patterns=37 * mult, band_hex_width=4, max_hamming=3
        )
        plan = final_plan(df)
        assert "SortMergeJoin" in plan, "image verify joins lost their merge pins"
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert_no_checkpoint_broadcasts(plan, "image_dedup_k3")

    # e2e FIRST: its materialized stage-0 cache is the biggest single
    # allocation at 64x, so it must run against a clean heap; the fuzzy
    # audit's checkpoint blocks are unpersisted explicitly either way
    # (the ordering + cleanup is what the first 64x run OOM'd without)
    def hybrid_rrf_fusion_stays_pool_bounded() -> None:
        # the hybrid retrieval's load-bearing plan facts at the audit
        # mult: the RRF fusion keeps its full-outer shape over
        # pool-capped inputs (each ranker's partial WindowGroupLimit
        # still present), no cross join appears, and every broadcast in
        # the plan is INTENT (F.broadcast of the literal query/anchor
        # tables or a bounded contraction), not an estimate-driven pick
        # — triaged with the hazard-sweep technique: estimate-driven
        # broadcasts vanish under autoBroadcastJoinThreshold=-1, hinted
        # ones survive, so the strict-flag count must not drop.
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
            retrieval_hybrid_rrf,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs_m = amplify(docs, mult, ["doc_id"])
        embs_m = amplify(embs, mult, ["vec_id"])

        plan = final_plan(retrieval_hybrid_rrf(spark, sf_dir, docs=docs_m, embs=embs_m))
        # final_plan materialized _bm25_scores' lazy localCheckpoints
        # (tf is (doc_id, token)-grained at 64x); release them before
        # the strict-flag A/B re-executes the query twice more (r10
        # ADVICE — the blocks otherwise outlive the fn)
        _drop_persistent_blocks(spark)
        assert "FullOuter" in plan, "RRF fusion join vanished from the final plan"
        assert "CartesianProduct" not in plan, "hybrid grew an unguarded cross join"
        assert plan.count("WindowGroupLimit") >= 3, (
            "a ranker lost its partial top-k group limit"
        )

        import contextlib
        import importlib.util
        import io as _io

        spec = importlib.util.spec_from_file_location(
            "explain_audit", Path(__file__).resolve().parent / "explain_audit.py"
        )
        ea = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ea)

        def strict_flags(threshold: str | None) -> list[str]:
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            if threshold is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
            try:
                df = retrieval_hybrid_rrf(spark, sf_dir, docs=docs_m, embs=embs_m)
                buf = _io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            return ea.checkpoint_broadcast_flags(buf.getvalue(), strict=True)

        default_n = len(strict_flags(None))
        pinned_n = len(strict_flags("-1"))
        assert default_n <= pinned_n, (
            f"hybrid_rrf: {default_n - pinned_n} estimate-driven "
            f"checkpoint broadcast(s) at mult={mult} (default {default_n} "
            f"strict flags vs {pinned_n} under threshold=-1)"
        )

    def hybrid_served_reads_only_pruned_indexes() -> None:
        # the composed hybrid SERVE (r11 verdict ask #3): both halves
        # must read storage through their manifest prunings — every
        # input file of the serve plan is a query-bucket posting file,
        # a probed-cell file, the 1-row stats table, or the anchors'
        # id-pushdown embeddings read; NO documents scan, no unpruned
        # index partition, no corpus-sized exchange (fusion stays the
        # pool-bounded full outer join).
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
            read_versioned_table,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
            _BM25_QUERIES,
            _RRF_ANCHORS,
            _bm25_index_root,
            _hybrid_dense_index_root,
            _term_bucket_py,
            hybrid_rrf_served_from_roots,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.similarity import (
            ivf_probed_cells,
        )
        from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
            _IVF_FIXED_CENTROIDS,
        )

        docs_m = amplify(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            mult,
            ["doc_id"],
        )
        embs_raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        embs_m = amplify(embs_raw, mult, ["vec_id"])
        sroot = _bm25_index_root(spark, docs_m, f"audit_hyb_bm25_m{mult}")
        droot = _hybrid_dense_index_root(spark, embs_m, f"audit_hyb_ivf_m{mult}")
        df = hybrid_rrf_served_from_roots(spark, sroot, droot, embs_m)
        plan = final_plan(df)
        # the index builds localCheckpoint tf frames; release before
        # the file-set comparison re-reads manifests (r10 ADVICE shape)
        _drop_persistent_blocks(spark)
        assert "FullOuter" in plan, "hybrid serve lost its RRF fusion join"
        assert "CartesianProduct" not in plan
        assert plan.count("WindowGroupLimit") >= 2, (
            "a served ranker lost its partial top-k group limit"
        )
        # broadcast triage by the hazard-sweep A/B (the hybrid_rrf
        # audit's technique, NOT the blunt checkpoint-scan assert: the
        # 3-row literal anchors frame is an INTENT broadcast whose
        # createDataFrame build is a Scan ExistingRDD and false-flags
        # it): estimate-driven broadcasts vanish under
        # autoBroadcastJoinThreshold=-1, hinted ones survive, so the
        # strict-flag count must not drop.
        import contextlib
        import importlib.util
        import io as _io

        spec = importlib.util.spec_from_file_location(
            "explain_audit", Path(__file__).resolve().parent / "explain_audit.py"
        )
        ea = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ea)

        def strict_flags(threshold: str | None) -> list[str]:
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            if threshold is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
            try:
                d2 = hybrid_rrf_served_from_roots(spark, sroot, droot, embs_m)
                buf = _io.StringIO()
                with contextlib.redirect_stdout(buf):
                    d2.explain("formatted")
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            return ea.checkpoint_broadcast_flags(buf.getvalue(), strict=True)

        default_n = len(strict_flags(None))
        pinned_n = len(strict_flags("-1"))
        assert default_n <= pinned_n, (
            f"hybrid_served: {default_n - pinned_n} estimate-driven "
            f"checkpoint broadcast(s) at mult={mult} (default {default_n} "
            f"strict flags vs {pinned_n} under threshold=-1)"
        )

        buckets = sorted({_term_bucket_py(t) for _, ts in _BM25_QUERIES for t in ts})
        cells = ivf_probed_cells(
            embs_m.where(F.col("vec_id").isin([v for _, v in _RRF_ANCHORS])),
            centroids=_IVF_FIXED_CENTROIDS,
            n_probe=2,
        )
        p_full = set(read_versioned_table(spark, f"{sroot}/postings").inputFiles())
        p_pruned = set(
            read_versioned_table(
                spark, f"{sroot}/postings", partition_filter={"tb": buckets}
            ).inputFiles()
        )
        c_full = set(read_versioned_table(spark, f"{droot}/cells").inputFiles())
        c_pruned = set(
            read_versioned_table(
                spark, f"{droot}/cells", partition_filter={"cid": cells}
            ).inputFiles()
        )
        assert len(p_pruned) < len(p_full), "posting pruning dropped nothing"
        assert len(c_pruned) < len(c_full), "cell pruning dropped nothing"
        stats_f = set(read_versioned_table(spark, f"{sroot}/stats").inputFiles())
        emb_f = set(embs_raw.inputFiles())
        opened = set(df.inputFiles())
        allowed = p_pruned | c_pruned | stats_f | emb_f
        stray = opened - allowed
        assert not stray, (
            f"hybrid serve opened {len(stray)} files outside the pruned "
            f"indexes/stats/anchor read, e.g. {sorted(stray)[:3]}"
        )
        print(
            f"hybrid_served audit mult={mult}: postings {len(p_full)} -> "
            f"{len(p_pruned)}, cells {len(c_full)} -> {len(c_pruned)}, "
            f"serve opened {len(opened)} files, all within the pruned set"
        )

    return {
        "consume_e2e_compute": consume_e2e_no_data_sized_broadcast,
        "consume_e2e_staged": consume_e2e_staged_scans_parquet,
        "fuzzy_er_closure": fuzzy_er_round_join_stays_smj,
        "fuzzy_k2": fuzzy_k2_stays_grouped_no_join,
        "jaccard_verify": jaccard_verify_pins_hold,
        "recsys_cooccur": recsys_topk_stays_grouped,
        "kcore_peel": kcore_round_join_stays_smj,
        "image_dedup_k3": image_dedup_k3_pins_hold,
        "image_pipeline_k3": image_pipeline_k3_pins_hold,
        "audio_dedup": audio_dedup_pins_hold,
        "multimodal_summary": multimodal_summary_pins_hold,
        "image_incr": incr_pair_filter_inside_generation,
        "image_served": image_served_plan_is_parquet_fed,
        "ivf_served": ivf_served_no_corpus_side,
        "factory_nightly": factory_nightly_pins_hold,
        # hybrid_rrf LAST (r10 ADVICE): final_plan materializes
        # _bm25_scores' lazy localCheckpoint frames (tf is
        # (doc_id, token)-grained at 64x) three times over — once for
        # the plan, twice for the strict-flag A/B — and those blocks
        # are only reclaimable via the post-audit sweep below; running
        # it first would put the e2e audit (the biggest single
        # allocation, which must see a clean heap) on a dirty one.
        "hybrid_rrf": hybrid_rrf_fusion_stays_pool_bounded,
        # hybrid_served after hybrid_rrf for the same reason: its index
        # builds materialize the BM25 tf checkpoints at the audit mult
        "hybrid_served": hybrid_served_reads_only_pruned_indexes,
        # the shared-lifecycle multi-night segment contract (r12
        # verdict ask #1): 4 sequential nightly merges on the BM25
        # posting store, then OPTIMIZE must be layout-only (served
        # scores bit-identical), collapse the pruned serve to one file
        # per live (seg, tb) dir, and keep the 1-row stats table equal
        # to a full recompute. Runs on the BASE corpus by design — the
        # contract is about segment COUNT, not corpus size (the mult
        # sweeps above own that axis).
        "segment_accum": lambda: segment_accumulation(
            spark, sf_dir, n_nights=4, verbose=False
        ),
    }


def segment_accumulation(
    spark: SparkSession, sf_dir: str, n_nights: int = 8, *, verbose: bool = True
) -> list[dict]:
    """The multi-night segment-accumulation probe (r12 verdict ask #1,
    the generalized r11 ask #7): every index family consumes the shared
    sinks/indexes.py lifecycle, so ONE experiment on the
    highest-segment-rate family — the BM25 posting store, whose nightly
    merge adds a whole new (seg, tb=0..7) partition family — certifies
    nightly operation for BM25, IVF, IVFADC, and the signature stores
    at once. The existing maintenance pytests cover ONE
    create+merge+OPTIMIZE+VACUUM cycle; this runs ``n_nights``
    SEQUENTIAL nightly merges, recording serve time and opened-file
    count after each, then OPTIMIZEs and asserts the three contracts:

    (a) served scores bit-identical before/after OPTIMIZE (compaction
        is layout-only);
    (b) the pruned serve's opened-file count collapses to O(live
        pruned partition dirs) — exactly one file per (seg, tb) dir
        the query's term buckets select;
    (c) the 1-row stats table stays consistent under compaction: the
        stored (n_docs, total_len) equals a full recompute from the
        corpus + the post-OPTIMIZE posting snapshot.

    The run itself shows WHY a fourth lifecycle verb exists: each
    nightly merge writes exactly one file per touched (seg, tb) dir,
    so OPTIMIZE (files-per-dir compaction) finds nothing to do while
    the opened-file count still grows O(nights) — a year of nightly
    segments is 365 × term-bucket dirs per pruned serve. So after the
    OPTIMIZE contracts, the probe runs ``coalesce_history("seg", 0)``
    — the Lucene-model segment merge — and asserts

    (d) served scores bit-identical across the fold (seg is ingest
        provenance; scoring sums tf over all segments);
    (e) the pruned serve collapses to exactly one file per term
        bucket — the dir count is back to O(residual partitions),
        independent of how many nights accumulated;
    (f) the store keeps operating: one MORE nightly merge (shifted-id
        replicas of the night-0 docs — genuinely new keys) lands on
        the folded base and the served scores equal the in-memory
        ``_bm25_scores`` over the grown corpus — ground truth, not
        store-vs-store.

    Nights are disjoint ``doc_id % (n_nights+1)`` slices (historic =
    the last residue), so after night N the store holds the full
    corpus and the recompute in (c) has a closed form. Returns the
    per-segment-count rows for SCALE.md's table."""
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.indexes import (
        IncrementalIndexStore,
        fresh_index_root,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        read_versioned_table,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.graph_retrieval import (
        _BM25_QUERIES,
        _bm25_postings,
        _bm25_scores,
        _bm25_scores_served,
        _bm25_seg_stats,
        _term_bucket_py,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    mod = n_nights + 1
    hist = docs.where(F.col("doc_id") % mod == n_nights)
    root = fresh_index_root("probe_seg_accum")
    postings = IncrementalIndexStore(
        spark, f"{root}/postings", keys=["token", "doc_id"], partition_by=["seg", "tb"]
    )
    hist_p = _bm25_postings(hist, seg=0)
    postings.build(hist_p)
    stats = IncrementalIndexStore(
        spark, f"{root}/stats", keys=["sid"], partition_by=["sid"]
    ).build(_bm25_seg_stats(hist, hist_p))
    buckets = sorted({_term_bucket_py(t) for _, ts in _BM25_QUERIES for t in ts})

    def timed_serve() -> float:
        _drop_persistent_blocks(spark)  # _bm25_scores_served checkpoints p_q
        t0 = time.time()
        _bm25_scores_served(spark, root).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        _drop_persistent_blocks(spark)
        return dt

    def opened_files() -> int:
        return len(postings.serve({"tb": buckets}).inputFiles())

    rows: list[dict] = [
        {"segments": 1, "serve_s": round(timed_serve(), 2), "files": opened_files()}
    ]
    if verbose:
        print(f"segment-accum: segments=1 serve={rows[0]['serve_s']}s files={rows[0]['files']}")
    for night in range(n_nights):
        batch = docs.where(F.col("doc_id") % mod == night)
        bp = _bm25_postings(batch, seg=night + 1)
        postings.merge(bp)
        stats.merge(
            stats.serve()
            .unionByName(_bm25_seg_stats(batch, bp))
            .groupBy("sid")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("total_len").cast("bigint").alias("total_len"),
            )
        )
        row = {
            "segments": night + 2,
            "serve_s": round(timed_serve(), 2),
            "files": opened_files(),
        }
        rows.append(row)
        if verbose:
            print(
                f"segment-accum: segments={row['segments']} "
                f"serve={row['serve_s']}s files={row['files']}"
            )

    # --- OPTIMIZE and the three contracts
    served_before = sorted(
        map(tuple, _bm25_scores_served(spark, root).collect())
    )
    compacted = postings.optimize()
    stats.optimize()
    post = {
        "segments": n_nights + 1,
        "serve_s": round(timed_serve(), 2),
        "files": opened_files(),
        "optimized": True,
        "compacted_dirs": len(compacted),
    }
    rows.append(post)
    served_after = sorted(map(tuple, _bm25_scores_served(spark, root).collect()))
    # (a) layout-only
    assert served_after == served_before, (
        "OPTIMIZE changed served BM25 scores — compaction must be layout-only"
    )
    # (b) one file per live pruned (seg, tb) dir
    pruned = postings.serve({"tb": buckets})
    live_dirs = pruned.select("seg", "tb").distinct().count()
    assert post["files"] == live_dirs, (
        f"post-OPTIMIZE pruned serve opened {post['files']} files for "
        f"{live_dirs} live pruned dirs — expected exactly one per dir"
    )
    # (c) stats row == full recompute over the now-complete corpus
    st = read_versioned_table(spark, f"{root}/stats").collect()[0]
    n_docs_true = docs.count()
    total_len_true = (
        read_versioned_table(spark, f"{root}/postings")
        .agg(F.coalesce(F.sum("tf"), F.lit(0)).cast("bigint").alias("t"))
        .collect()[0]["t"]
    )
    assert (st["n_docs"], st["total_len"]) == (n_docs_true, total_len_true), (
        f"stats row {(st['n_docs'], st['total_len'])} != recompute "
        f"{(n_docs_true, total_len_true)} after {n_nights} merges + OPTIMIZE"
    )
    if verbose:
        print(
            f"segment-accum: post-OPTIMIZE serve={post['serve_s']}s "
            f"files={post['files']} (= {live_dirs} live pruned dirs, "
            f"{post['compacted_dirs']} dirs compacted); served bit-identical; "
            f"stats row == recompute ({n_docs_true} docs, {total_len_true} tokens)"
        )

    # --- COALESCE HISTORY and contracts (d)/(e)/(f): OPTIMIZE had
    # nothing to compact (each nightly merge writes one file per
    # touched dir) yet opened files grew O(nights) — the dir count is
    # what needs bounding, and that is the fourth lifecycle verb
    folded = postings.coalesce_history("seg", 0)
    served_folded = sorted(map(tuple, _bm25_scores_served(spark, root).collect()))
    # (d) the fold is provenance-only: served scores bit-identical
    assert served_folded == served_after, (
        "coalesce_history changed served BM25 scores — seg must be "
        "ingest provenance scoring never reads"
    )
    # (e) dir count back to O(residual partitions): one file per bucket
    fold_row = {
        "segments": 1,
        "serve_s": round(timed_serve(), 2),
        "files": opened_files(),
        "coalesced": True,
        "folded_dirs": len(folded),
    }
    rows.append(fold_row)
    assert fold_row["files"] == len(buckets), (
        f"post-coalesce pruned serve opened {fold_row['files']} files for "
        f"{len(buckets)} query term buckets — expected one per bucket"
    )
    # (f) the store keeps operating: one MORE night lands on the folded
    # base (shifted-id replicas of the night-0 docs = genuinely new
    # keys) and the served scores equal the in-memory scorer over the
    # grown corpus — ground truth, not store-vs-store
    batch_next = docs.where(F.col("doc_id") % mod == 0).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(10**9)).cast("bigint")
    )
    bp_next = _bm25_postings(batch_next, seg=1)
    postings.merge(bp_next)
    stats.merge(
        stats.serve()
        .unionByName(_bm25_seg_stats(batch_next, bp_next))
        .groupBy("sid")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_len").cast("bigint").alias("total_len"),
        )
    )
    served_grown = sorted(map(tuple, _bm25_scores_served(spark, root).collect()))
    truth = sorted(
        map(
            tuple,
            _bm25_scores(spark, sf_dir, docs=docs.unionByName(batch_next))
            .collect(),
        )
    )
    assert served_grown == truth, (
        "post-coalesce nightly merge serves scores != in-memory BM25 "
        "over the grown corpus — the folded store must keep operating"
    )
    rows.append(
        {
            "segments": 2,
            "serve_s": round(timed_serve(), 2),
            "files": opened_files(),
            "post_coalesce_merge": True,
        }
    )
    if verbose:
        print(
            f"segment-accum: coalesce folded {len(folded)} dirs -> serve="
            f"{fold_row['serve_s']}s files={fold_row['files']} "
            f"(= {len(buckets)} buckets); served bit-identical across the "
            f"fold; next nightly merge on the folded base matches the "
            f"in-memory scorer over the grown corpus "
            f"(serve={rows[-1]['serve_s']}s files={rows[-1]['files']})"
        )
    return rows


def multimodal_nights(
    spark: SparkSession, sf_dir: str, n_nights: int = 4, mult: int = 1
) -> list[dict]:
    """The multimodal factory's N-night continuation probe (r12 verdict
    ask #7): the pack-continuation pytest covers 2 nights at sf0.01 and
    the r12 probe 1 night at 4 mults; this runs ``n_nights`` SEQUENTIAL
    nights against one (optionally amplified) historic store and
    asserts the exactly-once continuation contract at probe tier:

    - survivor offsets are GLOBALLY contiguous: ordered by (night,
      doc_id), each night's first survivor starts exactly where the
      previous night ended, all the way back to the historic base;
    - the stats row advances after each night by EXACTLY that night's
      survivors' token total (tomorrow's base is tonight's end).

    Night batches are the base fixture's ``doc_id % 5 = 0`` arrivals
    split into ``n_nights`` ID-ORDERED CONTIGUOUS slices (ntile over
    doc_id), for two reasons. (1) Semantics: a production ingest
    assigns monotonically increasing ids, so id order IS arrival
    order — under contiguous slices the factory's hardcoded
    batch-membership rules (the ``x%5=0 OR y%5=0`` pair restriction,
    the larger-id later-side rule, min-id fp ownership) resolve every
    cross-NIGHT conflict to the earlier night, exactly the
    arrival-order contract; a residue split (``doc_id % (5*n)``)
    would let an earlier night's doc carry a LARGER id than a later
    near-dup and mis-attribute the duplicate verdict. (2) Mixture: a
    ``% 20`` residue split correlates with the ``% 3`` / ``% 4``
    payload-carrier predicates — night 0 would be 100% audio
    carriers (mass near-dup kill, zero survivors) and nights 1-3
    would carry none, which is how the first version of this probe
    failed. Amplification shifts doc_id by 1e9 (≡ 0 mod 20), so the
    historic slice keeps its residues."""
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.indexes import (
        IncrementalIndexStore,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.llm import (
        factory_multimodal_nightly,
        factory_multimodal_store_build,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    hist = amplify(docs.where(F.col("doc_id") % 5 != 0), mult, ["doc_id"])
    root = factory_multimodal_store_build(spark, hist, f"probe_mm_nights_m{mult}")
    stats = IncrementalIndexStore(
        spark, f"{root}/stats", keys=["sid"], partition_by=["sid"]
    )
    base = stats.serve().collect()[0]["base_tokens"]
    expect_off = base
    rows: list[dict] = []
    from pyspark.sql import Window

    arrivals = docs.where(F.col("doc_id") % 5 == 0).withColumn(
        "__night", F.ntile(n_nights).over(Window.orderBy("doc_id")) - 1
    )
    for night in range(n_nights):
        batch = arrivals.where(F.col("__night") == night).drop("__night")
        t0 = time.time()
        out = factory_multimodal_nightly(spark, batch, root).collect()
        dt = time.time() - t0
        _drop_persistent_blocks(spark)
        surv = sorted(
            (r for r in out if r["is_survivor"]), key=lambda r: r["doc_id"]
        )
        assert surv, f"night {night}: no survivors — vacuous slice"
        # offsets: one global prefix sum continuing across nights
        for r in surv:
            assert r["start_offset"] == expect_off, (
                f"night {night} doc {r['doc_id']}: offset {r['start_offset']} "
                f"!= expected {expect_off} — continuation broken"
            )
            expect_off += r["n_words_main"]
        # stats: advanced by exactly this night's survivor total
        after = stats.serve().collect()[0]["base_tokens"]
        assert after == expect_off, (
            f"night {night}: stats row {after} != survivors' end {expect_off}"
        )
        rows.append(
            {
                "night": night + 1,
                "nightly_s": round(dt, 2),
                "survivors": len(surv),
                "base_after": int(after),
            }
        )
        print(
            f"mm-nights m{mult}: night={night + 1} {dt:.2f}s "
            f"survivors={len(surv)} base_after={after}"
        )
    print(
        f"mm-nights m{mult}: {n_nights} nights contiguous from base {base} "
        f"to {expect_off}; stats advanced exactly per night"
    )
    return rows


def _drop_persistent_blocks(spark) -> None:
    """Release every persistent RDD block (localCheckpoints included) —
    bench.py's inter-query cleanup: the async ContextCleaner lags
    Python refcounts, so without this each audit/probe runs against
    executors still carrying its predecessors' blocks (the documented
    64x OOM mode)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="1,4,8")
    ap.add_argument("--only", default="", help="comma-separated probe names to run")
    ap.add_argument(
        "--plan-audit",
        action="store_true",
        help="after the timed runs, re-execute the audited probes at the "
        "largest mult and assert their final adaptive plans (SMJ pins "
        "hold, no data-sized broadcasts)",
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions for every timed run "
        "(ignores the per-probe SCALED_SHUFFLE rules) — the A/B knob for "
        "diagnosing whether a probe step is partition-bound",
    )
    ap.add_argument(
        "--audit-only",
        action="store_true",
        help="skip the timed runs; only execute the plan audits at the "
        "largest mult (a fresh JVM per audit sweep keeps 64x heap "
        "headroom honest)",
    )
    ap.add_argument(
        "--segments",
        type=int,
        default=0,
        metavar="N",
        help="run ONLY the multi-night segment-accumulation probe: N "
        "sequential nightly BM25 merges with serve time + opened-file "
        "count per segment count, then OPTIMIZE + the three lifecycle "
        "assertions (r12 verdict ask #1)",
    )
    ap.add_argument(
        "--mm-nights",
        type=int,
        default=0,
        metavar="N",
        help="run ONLY the multimodal factory's N-night continuation "
        "probe: sequential nights against one historic store, asserting "
        "globally contiguous offsets and exact stats advances (r12 "
        "verdict ask #7); --mults' LAST value is the historic mult",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    only = {n for n in args.only.split(",") if n}

    import os as _os

    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark()

    if args.segments:
        segment_accumulation(spark, args.sf, n_nights=args.segments)
        return 0
    if args.mm_nights:
        multimodal_nights(spark, args.sf, n_nights=args.mm_nights, mult=mults[-1])
        return 0

    # Per-probe shuffle sizing at big mults. The sort-heavy corpus
    # probes need partitions scaled with the data (32 partitions that
    # fit sf0.1 carry ~24M rows each at 64x and blow the sort heap —
    # the 64x jaccard audit OOMs at 32), but scaling GLOBALLY is wrong:
    # consume_e2e at 64x measured 358s under 128 partitions vs 185s at
    # 32 (many small stages + the stage-0 cache pay per-task overhead,
    # and cpus*mult/4 = 512 was slower for jaccard too). So the scale-up
    # is opt-in per probe; AQE coalesces the small stages back down.
    SCALED_SHUFFLE = {
        "jaccard_verify": lambda mult: max(cpus, cpus * mult // 16),
        # the co-occurrence top-k sorts per partition (WindowGroupLimit);
        # 32 partitions at 64x carry the whole pair table through one
        # sort each — same pressure profile as jaccard's 64x. r7 A/B at
        # 64x: 156.6s at 32 partitions, 137.4s at 128 (mult/16 — the
        # 16x->64x ratio falls 4.58x -> 4.02x), 168.1s at 512 (the r6
        # over-scaling caution reproduces here too).
        "recsys_cooccur": lambda mult: max(cpus, cpus * mult // 16),
        # the triangle wedge join sorts edge-sized tables per partition;
        # at 16x with 32 partitions the sort is heap/spill-bound
        # (GCLocker alloc warnings; r14 A/B at 16x/c32: 121.5 s at 32
        # partitions vs 76.6 s at 128) — same pressure profile as
        # recsys_cooccur's note above
        "triangle_count": lambda mult: max(cpus, cpus * mult // 16),
        "triangle_count_approx": lambda mult: max(cpus, cpus * mult // 16),
    }

    def shuffle_for(name: str, mult: int) -> int:
        if args.shuffle_partitions is not None:
            return args.shuffle_partitions
        return SCALED_SHUFFLE.get(name, lambda _m: cpus)(mult)

    def run(obj) -> None:
        if callable(obj):
            obj()
        else:
            obj.write.format("noop").mode("overwrite").save()

    def selected(spark, sf, mult):
        items = probes(spark, sf, mult, only or None)
        return {n: v for n, v in items.items() if not only or n in only}

    results: dict[str, dict[int, float]] = {}
    if not args.audit_only:
        # warm codegen/scan caches so mult=1 is not penalized by startup
        for obj, _ in selected(spark, args.sf, 1).values():
            run(obj)
            spark.catalog.clearCache()

        for mult in mults:
            for name, (obj, rows) in selected(spark, args.sf, mult).items():
                spark.conf.set(
                    "spark.sql.shuffle.partitions", str(shuffle_for(name, mult))
                )
                t0 = time.time()
                run(obj)
                dt = time.time() - t0
                spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
                # consume_batch caches its stage-0 merge (intended within a
                # run: 4 slices share it); drop it so runs don't accumulate
                spark.catalog.clearCache()
                results.setdefault(name, {})[mult] = dt
                rate = rows / dt
                unit = (
                    f"{rate / 1e6:7.2f} Mrows/s"
                    if rate >= 1e5
                    else f"{rate / 1e3:7.1f} Krows/s"
                )
                print(f"{name:20s} mult={mult:<3d} {dt:6.2f}s  {unit}")

    if args.plan_audit or args.audit_only:
        audits = plan_audits(spark, args.sf, mults[-1])
        for name, audit in audits.items():
            if only and name not in only:
                continue
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_for(name, mults[-1]))
            )
            try:
                audit()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
                # checkpoint blocks an audit materialized must not
                # outlive it (r10 ADVICE: hybrid_rrf's tf/dl frames
                # dirtied the heap the e2e audit depends on)
                _drop_persistent_blocks(spark)
                spark.catalog.clearCache()
            print(f"PLAN-AUDIT {name:18s} mult={mults[-1]}  OK")

    if args.audit_only:
        return 0

    lo, hi = mults[0], mults[-1]
    data_ratio = hi / lo
    print(f"\nlinearity (time ratio vs {data_ratio:.0f}x data):")
    ok = True
    for name, times in results.items():
        ratio = times[hi] / times[lo]
        verdict = "linear-ish" if ratio <= data_ratio * 1.5 else "SUPERLINEAR"
        ok &= ratio <= data_ratio * 1.5
        print(f"  {name:18s} {ratio:5.1f}x  {verdict}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
