"""Measured scaling exponents for the dedup/ANN candidates path
(VERDICT r9 task #2).

Through r9 the 100 TB story for the LSH family was ARGUED (plan
shapes, skew histograms at fixture scale) but never MEASURED past
sf0.1 (5k docs). This tool closes that: it synthesizes corpora at
1× / 3× / 10× the sf0.1 document volume with an OPEN vocabulary
(vocab grows with N, past every bounded-dictionary cutoff) and a
fixed 10% near-duplicate rate, then times the four candidates-path
operators under forced-shuffle confs (auto-broadcast −1 on both the
static planner and AQE — the regime where no corpus-sized relation
can broadcast, i.e. the 100 TB plan):

  dedup_minhash_lsh            banding + fused exact verify
  dedup_incremental_minhash    new-batch bands vs stored corpus index
  text_containment_prefix_join PPJoin prefix filter + bitmask verify
  dedup_embedding_cosine_lsh   hyperplane buckets + in-bucket verify

For each (op, scale): median wall time over --runs measured runs
(after one warm run), result-row count, and the rows-per-partition
histogram of the final stage (max / p50 across shuffle partitions —
the straggler signal). Between consecutive scales it derives the
fitted exponent alpha = log(t2/t1) / log(n2/n1); alpha ≈ 1 is the
linear-scaling target, alpha ≈ 2 means a hidden all-pairs stage.

Corpus shape (all Spark column expressions — no driver-side loops):
  - 30 tokens/doc drawn from a vocabulary of max(1000, 2N) synthetic
    words via a fixed affine hash of (doc_id, position) — open vocab,
    realistic cross-doc overlap so the inverted index has real
    postings;
  - the last 10% of doc_ids are near-dup twins of the first 10%
    (one token replaced → J ≈ 0.93, containment ≈ 0.97 — above both
    verify thresholds), so candidate generation has real work;
  - embeddings: 0.4N vectors, dim 64, deterministic sinusoid
    components; the last 10% are twins of earlier vectors with one
    component nudged by 1e-3 (cosine ≈ 1 − 1e-7).

Usage: python -m tools.scalebench [--scales 5000,15000,50000]
                                  [--runs 2] [--ops a,b,...]
Prints ONE JSON line; SCALING.md carries the analyzed table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time


def _build_corpus(spark, out_dir: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    vocab = max(1000, 2 * n_docs)
    n_dup = n_docs // 10
    toks_per_doc = 30

    # token t of doc i: xxhash64(doc, position) into the open
    # vocabulary (an affine hash here creates SYSTEMATIC positional
    # aliasing — shifted near-dup pairs beyond the intended twins);
    # the SAME function for base and twin docs, so a twin (doc_id i in
    # the last decile, twinning base b = i - (n_docs - n_dup) in the
    # first decile) reuses b's tokens except position 29, which is
    # replaced by a doc-unique token -> J ≈ 0.935, C(twin→base) ≈ 0.97.
    def tok(src_col, pos):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src_col, F.lit(pos)), F.lit(vocab)).cast(
                "string"
            ),
        )

    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    base_of = F.when(
        F.col("doc_id") >= n_docs - n_dup,
        F.col("doc_id") - (n_docs - n_dup),
    ).otherwise(F.col("doc_id"))
    is_twin = F.col("doc_id") >= n_docs - n_dup
    cols = [tok(base_of, p) for p in range(toks_per_doc - 1)]
    last = F.when(
        is_twin, F.concat(F.lit("uniq_"), F.col("doc_id").cast("string"))
    ).otherwise(tok(base_of, toks_per_doc - 1))
    docs = ids.select(
        "doc_id",
        F.concat_ws(" ", *cols, last).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("syn").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    # Embeddings: FIXED-SIZE tight clusters whose COUNT grows with N —
    # the realistic shape (an embedding corpus is topically clustered;
    # more data = more topics, not bigger topics). Cluster = a
    # hash-uniform center + 0.2-scaled per-vector noise, L2-normalized:
    # within-cluster cosine ≈ 0.96 (true dups, linear count), cross
    # cluster ≈ 0 (below the op's 0.4 dot threshold). A diffuse or
    # fixed-K corpus makes the op's OUTPUT itself quadratic and the
    # measurement would probe the corpus, not the operator.
    n_vec = max(200, (2 * n_docs) // 5)
    cluster = (F.col("vec_id") / 20).cast("bigint")

    def uniform(seed_col, c, salt):
        return (
            F.pmod(
                F.xxhash64(seed_col, F.lit(c), F.lit(salt)),
                F.lit(2_000_001),
            ).cast("double")
            / F.lit(1_000_000.0)
            - F.lit(1.0)
        )

    raw = F.array(
        *[
            uniform(cluster, c, "ctr")
            + F.lit(0.2) * uniform(F.col("vec_id"), c, "nz")
            for c in range(64)
        ]
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x)
    )
    emb = F.transform(raw, lambda x: (x / norm).cast("float"))
    spark.range(n_vec).select(F.col("id").alias("vec_id")).select(
        "vec_id",
        emb.alias("embedding"),
        (cluster % 10).cast("int").alias("label"),
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


_DEFAULT_OPS = (
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "text_containment_prefix_join",
    "dedup_embedding_cosine_lsh",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="5000,15000,50000")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--ops", default=",".join(_DEFAULT_OPS))
    ap.add_argument(
        "--pair-config",
        default=None,
        metavar="TABLESxPLANES",
        help="override llm.PAIR_TABLES/PAIR_PLANES (e.g. 8x12) for the "
        "measurement arm — the op docstring's 'corpus-tuned constants' "
        "knob; the fixture default 16x3 sits at LSH's selectivity "
        "floor and is expected to go quadratic on diffuse-angle "
        "corpora (Spark path only; the baked oracle SQL is not "
        "consulted here)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    ops_wanted = args.ops.split(",")

    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    from pyspark.sql import functions as F

    from logdb_spark.plans.session import get_spark
    from logdb_spark.registry import all_operators, release_tracked_caches

    spark = get_spark("logdb-scalebench")
    ops = all_operators()
    pair_config = None
    if args.pair_config:
        from logdb_spark.operators import llm

        t, p = (int(v) for v in args.pair_config.lower().split("x"))
        llm.PAIR_TABLES, llm.PAIR_PLANES = t, p
        pair_config = f"{t}x{p}"
    forced = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    before = {k: spark.conf.get(k, None) for k in forced}
    for k, v in forced.items():
        spark.conf.set(k, v)

    results: dict[str, dict] = {name: {} for name in ops_wanted}
    try:
        for n in scales:
            scratch = tempfile.mkdtemp(prefix=f"logdb_scale_{n}_")
            try:
                _build_corpus(spark, scratch, n)
                for name in ops_wanted:
                    fn = ops[name].fn
                    if (
                        name == "dedup_embedding_cosine_lsh"
                        and pair_config is None
                    ):
                        # r11: the registered face pins the fixture
                        # 16x3 for oracle stability; with no explicit
                        # --pair-config, measure what a USER gets —
                        # the public callable's adaptive default.
                        from logdb_spark.operators import llm

                        fn = llm.dedup_embedding_cosine_lsh

                    def drop_caches():
                        # r10 review: track_persist'd intermediates
                        # from one invocation are plan-matched by the
                        # CacheManager and SERVED to the next, so a
                        # timed run after an uncleared warm run skips
                        # every pre-persist stage (or, for UDF-bearing
                        # plans, piles up duplicate cache entries).
                        # Each measured run must pay full cost.
                        release_tracked_caches()
                        spark.catalog.clearCache()

                    fn(spark, scratch).write.mode("overwrite").format(
                        "noop"
                    ).save()  # warm: JVM/codegen/file-listing only...
                    drop_caches()  # ...data caches must NOT carry over
                    samples = []
                    for _ in range(args.runs):
                        t0 = time.perf_counter()
                        fn(spark, scratch).write.mode("overwrite").format(
                            "noop"
                        ).save()
                        samples.append(time.perf_counter() - t0)
                        drop_caches()
                    hist = (
                        fn(spark, scratch)
                        .withColumn("pid", F.spark_partition_id())
                        .groupBy("pid")
                        .count()
                        .agg(
                            F.max("count").alias("mx"),
                            F.expr("percentile(count, 0.5)").alias("md"),
                            F.sum("count").alias("rows"),
                            F.count(F.lit(1)).alias("nparts"),
                        )
                        .first()
                    )
                    release_tracked_caches()
                    spark.catalog.clearCache()
                    results[name][n] = {
                        "sec": round(statistics.median(samples), 3),
                        "rows": int(hist["rows"]),
                        "part_max": int(hist["mx"]),
                        "part_p50": float(hist["md"]),
                        "nparts": int(hist["nparts"]),
                    }
            finally:
                shutil.rmtree(scratch, ignore_errors=True)

        for name, by_n in results.items():
            ns = sorted(by_n)
            for a, b in zip(ns, ns[1:]):
                alpha = math.log(by_n[b]["sec"] / by_n[a]["sec"]) / math.log(
                    b / a
                )
                by_n[b][f"alpha_vs_{a}"] = round(alpha, 2)

        out = {
            "scales": scales,
            "runs_per_point": args.runs,
            "forced_shuffle": True,
            "pair_config": pair_config,
            "results": results,
        }
        os.write(real_stdout, (json.dumps(out) + "\n").encode())
        return 0
    finally:
        for k, v in before.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
