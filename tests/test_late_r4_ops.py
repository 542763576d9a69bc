"""Semantic property pins for the late-r4 operators — cross-validation
beyond the DuckDB oracle (which is covered by test_correctness's
parametrized sweep): each test pins a property the oracle comparison
alone cannot express (bias direction, equivalence to an independent
formulation, bound tightness).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logdb_spark.operators.aggs import agg_entropy
from logdb_spark.operators.llm import dedup_fuzzy_edit, sample_mixture_weights
from logdb_spark.operators.sampling import sample_importance_weighted
from logdb_spark.operators.windows import win_ewma
from logdb_spark.sources.load import load_table
from tests.conftest import SF_SMALL


def test_importance_sample_is_length_biased(spark):
    """The whole point of weighted sampling: the sample must
    over-represent long documents. Pin that the sample's mean weight
    exceeds the corpus mean n_chars by a real margin."""
    sample = sample_importance_weighted(spark, SF_SMALL)
    s_mean = sample.agg(F.avg("weight")).first()[0]
    c_mean = (
        load_table(spark, SF_SMALL, "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert s_mean > c_mean * 1.05, (s_mean, c_mean)


def test_ewma_matches_pandas_ewm(spark):
    """The docstring claims pandas ewm(alpha=0.3, adjust=True)
    semantics — prove it against pandas itself on one series."""
    import pandas as pd

    out = (
        win_ewma(spark, SF_SMALL)
        .filter(F.col("event_type") == "error")
        .orderBy("hour")
        .toPandas()
    )
    # pandas ewm over the same hourly series, restricted to the same
    # trailing-24 frame by recomputing per position on the window
    rev = out["rev"].to_numpy()
    for i in (0, 5, len(rev) - 1):
        lo = max(0, i - 23)
        expect = (
            pd.Series(rev[lo : i + 1]).ewm(alpha=0.3, adjust=True).mean().iloc[-1]
        )
        assert abs(out["ewma_24h"].iloc[i] - round(expect, 6)) <= 1e-6, i


def test_fuzzy_edit_pairs_are_within_threshold_and_unique(spark):
    """Every reported pair must be orderable (a<b), unique, and at
    edit distance ≤ 10 under an independent python DP."""
    rows = dedup_fuzzy_edit(spark, SF_SMALL).collect()
    docs = {
        r["doc_id"]: r["text"][:40]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    seen = set()
    assert rows, "fixture must produce at least one fuzzy pair"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["edit_dist"] == lev(docs[r["doc_a"]], docs[r["doc_b"]])
        assert r["edit_dist"] <= 10


def test_recursive_chain_depth_equals_island_position(spark):
    """The recursion must agree with the rank-arithmetic islands
    derivation: within each run, depth is the 1-based position of the
    hour after the anchor."""
    from logdb_spark.operators.analytics import sql_recursive_spike_chain

    rows = sql_recursive_spike_chain(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        from datetime import datetime

        fmt = "%Y-%m-%d %H:%M:%S"
        delta = datetime.strptime(r["hour"], fmt) - datetime.strptime(
            r["run_start"], fmt
        )
        assert delta.total_seconds() == (r["depth"] - 1) * 3600


def test_entropy_bounds(spark):
    """Shannon entropy of a ≤5-outcome distribution lies in
    [0, ln 5]."""
    rows = agg_entropy(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["type_entropy"] <= math.log(5) + 1e-9


def test_mixture_rates_are_conservative(spark):
    """No upsampling (rate ≤ 1), under-represented languages keep
    everything (rate == 1 exactly when share < target), and the
    post-sampling mass never exceeds the original."""
    rows = sample_mixture_weights(spark, SF_SMALL).collect()
    total = sum(r["n_chars"] for r in rows)
    kept = 0.0
    for r in rows:
        assert 0 < r["sampling_rate"] <= 1.0
        if r["current_share"] < r["target_share"]:
            assert r["sampling_rate"] == 1.0
        kept += r["sampling_rate"] * r["n_chars"]
    assert kept <= total + 1e-6


def test_bloom_prefilter_actually_prunes(spark):
    """The bloom stage must pass all true matches (guaranteed by the
    oracle equality) while pruning a real fraction of non-matching
    fact rows before the exact join."""
    from logdb_spark.operators.joins import _BLOOM_BITS  # noqa: F401
    from logdb_spark.sources.load import load_table
    import logdb_spark.operators.joins as J

    cust = load_table(spark, SF_SMALL, "customer")
    orders = load_table(spark, SF_SMALL, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    idx_d = F.pmod(F.xxhash64("c_custkey"), F.lit(J._BLOOM_BITS))
    words = (
        dim.select(
            (idx_d / 64).cast("bigint").alias("widx"),
            (idx_d % 64).cast("int").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("word"))
    )
    idx_f = F.pmod(F.xxhash64("o_custkey"), F.lit(J._BLOOM_BITS))
    fact = orders.select(
        "o_custkey",
        (idx_f / 64).cast("bigint").alias("widx"),
        (idx_f % 64).cast("int").alias("bit"),
    )
    n_fact = fact.count()
    n_surv = (
        fact.join(F.broadcast(words), "widx")
        .filter(F.expr("(word & shiftleft(1L, bit)) != 0"))
        .count()
    )
    n_true = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi"
    ).count()
    assert n_true <= n_surv < n_fact, (n_true, n_surv, n_fact)


def test_dp_userlevel_clips_conserves_and_bounds(spark):
    """User-level DP release (r10): pin the three properties the
    oracle hash alone cannot express as *invariants* — (1) the clip
    is exactly per-user min(count, 32): summed over types, the
    released base counts equal sum_u min(|events_u|, 32) no matter
    WHICH 32 events each engine kept; (2) the clip actually bit on
    this fixture (some user exceeds 32), so the test would catch a
    no-op clip; (3) every released count sits within the advertised
    (1-1e-6) Laplace envelope b*ln(1/delta) = 64*ln(1e6) of its true
    clipped count, and the in-plan certificate agrees."""
    from logdb_spark.operators.logops import log_dp_noisy_release_userlevel

    rows = log_dp_noisy_release_userlevel(spark, SF_SMALL).collect()
    per_user = [
        r["c"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert max(per_user) > 32, "fixture no longer exercises the clip"
    assert sum(r["n_clipped"] for r in rows) == sum(
        min(c, 32) for c in per_user
    )
    assert sum(r["n_clipped"] for r in rows) < sum(per_user)
    for r in rows:
        assert r["noise_bound_ok"], r
        assert abs(r["noisy_count"] - r["n_clipped"]) <= 884.192676 + 1e-6
        assert r["k_clip"] == 32 and r["eps"] == 0.5


def test_dp_userlevel_window_is_user_partitioned(spark):
    """The contribution-bounding window must shuffle on user_id (the
    standard user-level DP pass), never run as a global
    single-partition sort."""
    import contextlib
    import io

    from logdb_spark.operators.logops import log_dp_noisy_release_userlevel

    df = log_dp_noisy_release_userlevel(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "hashpartitioning(user_id" in plan
    assert "rangepartitioning" not in plan


def test_dp_sum_userlevel_clips_and_bounds(spark):
    """Clipped-sum DP (r10): (1) the released base equals the sum of
    per-(user,type) min(contribution, 500) — engine-independent
    because the clip needs no ordering; (2) the clip actually bites on
    the fixture (n_users_clipped > 0 and the clipped release is
    strictly below the raw sum); (3) every noisy_sum sits within the
    advertised Laplace envelope of its clipped base and the in-plan
    certificate agrees."""
    from logdb_spark.functions.numeric import dec4
    from logdb_spark.operators.logops import log_dp_noisy_sum_userlevel

    rows = log_dp_noisy_sum_userlevel(spark, SF_SMALL).collect()
    ev = load_table(spark, SF_SMALL, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.sum(dec4("value")).alias("s")
    )
    agg = ut.agg(
        F.sum(F.least(F.col("s"), F.lit(500).cast("decimal(18,4)"))).alias(
            "clip_total"
        ),
        F.sum("s").alias("raw_total"),
        F.sum((F.col("s") > 500).cast("int")).alias("n_hit"),
    ).first()
    assert agg["n_hit"] > 0, "fixture no longer exercises the clip"
    assert sum(r["n_users_clipped"] for r in rows) == agg["n_hit"]
    released = sum(r["clipped_sum"] for r in rows)
    assert abs(released - float(agg["clip_total"])) < 0.05
    assert released < float(agg["raw_total"])
    for r in rows:
        assert r["noise_bound_ok"], r
        assert abs(r["noisy_sum"] - r["clipped_sum"]) <= 13815.510558
        assert r["clip_c"] == 500 and r["eps"] == 0.5


def test_bpe_vocab_is_the_applied_merge_table(spark):
    """The exported vocab must BE the table the tokenizer applies:
    contiguous merge ranks per level, counts non-increasing in rank,
    level sizes within the 256/64 caps, and every level-2 4-gram's
    aligned halves splittable into 2-char grams (structural sanity of
    the aligned encoding)."""
    from logdb_spark.operators.llm import text_bpe_vocab

    rows = text_bpe_vocab(spark, SF_SMALL).collect()
    by_level: dict[int, list] = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert set(by_level) == {1, 2}
    for level, cap, width in ((1, 256, 2), (2, 64, 4)):
        lv = sorted(by_level[level], key=lambda r: r["merge_rank"])
        assert 1 <= len(lv) <= cap
        assert [r["merge_rank"] for r in lv] == list(range(1, len(lv) + 1))
        assert all(len(r["gram"]) == width for r in lv)
        counts = [r["cnt"] for r in lv]
        assert counts == sorted(counts, reverse=True)
