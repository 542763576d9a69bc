"""Property tests for the deterministic sampling family — the oracle
gate proves value equality; these pin the SAMPLING guarantees the
oracle can't see (fraction balance, exact-k, plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logdb_spark.registry import all_operators
from tests.conftest import SF_SMALL

OPS = all_operators()


def test_split_fractions_balanced(spark):
    """~80/10/10 by hash prefix: each split within ±6 pp of target at
    n=500 (3σ for a binomial at these rates is ~5.4 pp)."""
    rows = OPS["sample_split_hash"].fn(spark, SF_SMALL).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in rows}
    n = sum(by.values())
    assert n == 500
    assert abs(by["train"] / n - 0.797) < 0.06
    assert abs(by["val"] / n - 0.102) < 0.06
    assert abs(by["test"] / n - 0.101) < 0.06


def test_split_deterministic(spark):
    a = sorted(map(tuple, OPS["sample_split_hash"].fn(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, OPS["sample_split_hash"].fn(spark, SF_SMALL).collect()))
    assert a == b


def test_stratified_exact_k(spark):
    """Exactly min(40, |stratum|) per language."""
    from logdb_spark.sources.load import load_table

    sizes = {
        r["lang"]: r["count"]
        for r in load_table(spark, SF_SMALL, "documents").groupBy("lang").count().collect()
    }
    got = {
        r["lang"]: r["count"]
        for r in OPS["sample_stratified_topk"].fn(spark, SF_SMALL).groupBy("lang").count().collect()
    }
    assert got == {lang: min(40, n) for lang, n in sizes.items()}


def test_uniform_topk_plan_is_take_ordered(spark):
    """The global k-sample must plan as TakeOrdered (per-partition
    top-k + driver merge of k rows), never a global sort — the scale
    guarantee this operator exists for."""
    df = OPS["sample_uniform_topk"].fn(spark, SF_SMALL)
    assert df.count() == 100
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortExec" not in plan


def test_kfold_covers_all_docs(spark):
    rows = OPS["sample_kfold_assign"].fn(spark, SF_SMALL).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in rows) == 500


def test_shard_budget_packing_properties(spark):
    """Shards are contiguous from 0 and every shard's payload stays
    within one document of the 20k-char budget (the floor-rule bound:
    a shard closes only when the running sum crosses the budget)."""
    from pyspark.sql import functions as F

    from logdb_spark.sources.load import load_table

    assign = OPS["sample_shard_budget"].fn(spark, SF_SMALL)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    per_shard = (
        assign.join(docs, "doc_id")
        .groupBy("shard_id")
        .agg(F.sum("n_chars").alias("chars"), F.count("*").alias("n"))
        .collect()
    )
    ids = sorted(r["shard_id"] for r in per_shard)
    assert ids == list(range(len(ids)))
    max_doc = docs.agg(F.max("n_chars")).first()[0]
    for r in per_shard:
        if r["shard_id"] != ids[-1]:  # last shard may be short
            assert r["chars"] >= 20_000 - max_doc
        assert r["chars"] <= 20_000 + max_doc


def test_hash_split_consistency_superset(spark):
    """The consistency guarantee: a sample at a LOWER threshold is a
    strict subset of the same sample at a higher one (growing the
    train fraction never moves a doc OUT of train) — this is the
    property engine-randomness sampling cannot give."""
    from pyspark.sql import functions as F

    from logdb_spark.operators.sampling import _hash_key
    from logdb_spark.sources.load import load_table

    d = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.substring(_hash_key(), 1, 2).alias("k2")
    )
    at_40pct = {r["doc_id"] for r in d.filter(F.col("k2") < "66").collect()}
    at_80pct = {r["doc_id"] for r in d.filter(F.col("k2") < "cc").collect()}
    assert at_40pct < at_80pct  # strict subset
    # and the op's train split IS the 80% set
    train = {
        r["doc_id"]
        for r in OPS["sample_split_hash"].fn(spark, SF_SMALL)
        .filter(F.col("split") == "train")
        .collect()
    }
    assert train == at_80pct


def test_cluster_safe_split_no_dup_pair_straddles(spark):
    """sample_cluster_safe_split's whole point: for EVERY verified
    near-dup pair, both members get the same split (per-doc
    sample_split_hash demonstrably violates this on the fixture, which
    is why the cluster-keyed variant exists)."""
    import pyspark.sql.functions as F

    from logdb_spark.operators.llm import dedup_minhash_lsh
    from logdb_spark.operators.sampling import (
        sample_cluster_safe_split,
        sample_split_hash,
    )
    from tests.conftest import SF_SMALL

    split = {
        r["doc_id"]: r["split"]
        for r in sample_cluster_safe_split(spark, SF_SMALL).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, SF_SMALL).collect()
    ]
    assert pairs
    for a, b in pairs:
        assert split[a] == split[b], f"dup pair ({a},{b}) straddles splits"

    # The per-doc split is NOT dup-safe on the same fixture — the
    # contrast that justifies the operator.
    naive = {
        r["doc_id"]: r["split"]
        for r in sample_split_hash(spark, SF_SMALL).collect()
    }
    assert any(naive[a] != naive[b] for a, b in pairs)


def test_pack_sequences_conservation_and_fill(spark):
    """Packing must conserve tokens (Σ pack tok_sum == corpus token
    count), produce contiguous pack ids per shard, and respect the
    sequential-fill rule: every pack's id equals
    floor(tokens-before-first-doc / 512), so no pack except a shard's
    last can START at or past the next 512 boundary with room left
    behind it — equivalently, per shard, pack p's cumulative start is
    in [512p, 512(p+1))."""
    from logdb_spark.sources.load import load_table

    rows = OPS["sample_pack_sequences"].fn(spark, SF_SMALL).collect()
    total = (
        load_table(spark, SF_SMALL, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("t"))
        .first()["t"]
    )
    assert sum(r["tok_sum"] for r in rows) == total
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(8))
    for shard, packs in by_shard.items():
        packs.sort(key=lambda r: r["pack_id"])
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        cum = 0
        for p in packs:
            assert 512 * p["pack_id"] <= cum < 512 * (p["pack_id"] + 1), (
                shard,
                p["pack_id"],
                cum,
            )
            cum += p["tok_sum"]


def test_pack_sequences_no_global_sort(spark):
    """The packing plan's only exchange is the hash partition on
    shard (plus the final pack aggregation) — a range partition would
    mean a global sort, which the per-shard design exists to avoid."""
    import contextlib
    import io

    df = OPS["sample_pack_sequences"].fn(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert "rangepartitioning" not in buf.getvalue()


def test_dedup_weights_sum_to_cluster_count(spark):
    """Each near-dup cluster's member weights (1/|cluster|) must sum
    to exactly 1, so the corpus-wide weight total equals the number of
    clusters — the invariant that makes downweighting equivalent to
    one-vote-per-cluster."""
    rows = OPS["sample_dedup_weights"].fn(spark, SF_SMALL).collect()
    n_clusters = len({r["canonical_id"] for r in rows})
    assert abs(sum(r["weight"] for r in rows) - n_clusters) < 1e-3
    assert all(0 < r["weight"] <= 1 for r in rows)
    assert all(r["cluster_size"] >= 1 for r in rows)
    singles = [r for r in rows if r["cluster_size"] == 1]
    assert all(r["weight"] == 1.0 for r in singles)


def test_bpe_tokenize_invariants(spark):
    """The subword count must sit strictly between the two budgets it
    replaces: tok_ws <= tok_bpe <= n_chars per document (a word of
    length L yields at least ceil(L/4) and at most L tokens), and the
    corpus-level subword/whitespace expansion factor must stay in a
    sane band — a tokenizer whose counts collapse to chars or to words
    has stopped doing its job even if it still hash-matches itself."""
    from logdb_spark.operators.llm import bpe_doc_tokens

    rows = bpe_doc_tokens(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["tok_ws"] <= r["tok_bpe"] <= r["n_chars"], r
    expansion = sum(r["tok_bpe"] for r in rows) / sum(
        r["tok_ws"] for r in rows
    )
    assert 1.2 <= expansion <= 2.5, expansion


def test_pack_bpe_conserves_and_exceeds_ws_packs(spark):
    """BPE packing must conserve subword tokens exactly (sum of pack
    tok_sum == corpus tok_bpe total) and, because each doc costs more
    subwords than words, produce at least as many packs as the
    whitespace variant under the same 512 budget."""
    from logdb_spark.operators.llm import bpe_doc_tokens

    bpe_rows = OPS["sample_pack_sequences_bpe"].fn(spark, SF_SMALL).collect()
    ws_rows = OPS["sample_pack_sequences"].fn(spark, SF_SMALL).collect()
    total = (
        bpe_doc_tokens(spark, SF_SMALL)
        .agg(F.sum("tok_bpe").alias("t"))
        .first()["t"]
    )
    assert sum(r["tok_sum"] for r in bpe_rows) == total
    assert len(bpe_rows) >= len(ws_rows)
    assert {r["shard"] for r in bpe_rows} == set(range(8))
