"""Round-3 wave: plan audits + the aHash band-recall pigeonhole property.

(Oracle parity for the same queries runs in test_oracle.py automatically —
these tests pin the SHAPE of each plan, which parity cannot see.)
"""

from __future__ import annotations

import random

from kinesis_customer_sample_spark.plans import audit
from kinesis_customer_sample_spark.registry import load_registry

REGISTRY = load_registry()


def audit_of(spark, sf_dir, name: str):
    return audit(REGISTRY[name].fn(spark, sf_dir))


def test_ohlc_is_one_partial_agg(spark, sf_dir):
    # OHLC bars: one hash aggregation, map-side combined; min_by/max_by
    # must not degrade into sort-based first/last (no global sort)
    facts = audit_of(spark, sf_dir, "q205_ohlc_downsample")
    assert facts.has_partial_agg
    assert facts.n_exchanges == 1
    assert "Window" not in facts.text


def test_ewma_single_group_shuffle(spark, sf_dir):
    # one shuffle on user_id; the fold happens inside the aggregate, so no
    # extra exchange or window may appear
    facts = audit_of(spark, sf_dir, "q206_ewma_smoothing")
    assert facts.n_exchanges == 1
    assert "Window" not in facts.text


def test_ngram_dup_rate_no_pair_join(spark, sf_dir):
    # the linear-cost dedup signal: postings⋈DF equi-join only — any
    # cartesian or pair-generation would defeat the point
    facts = audit_of(spark, sf_dir, "q207_ngram_dup_rate")
    assert not facts.has_cartesian
    assert facts.has_partial_agg


def test_key_skew_audit_no_global_sort(spark, sf_dir):
    # percentile() is an aggregate — the audit must not plan a global
    # sort/window over the per-key counts
    facts = audit_of(spark, sf_dir, "q209_key_skew_audit")
    assert "Window" not in facts.text
    assert facts.has_partial_agg


def test_ahash_neardup_banded_topk(spark, sf_dir):
    # candidates come from the band-bucket equi-join (never all-pairs) and
    # the report is TakeOrderedAndProject, not sort-the-world
    facts = audit_of(spark, sf_dir, "q210_media_ahash_neardup")
    assert not facts.has_cartesian
    assert "TakeOrderedAndProject" in facts.text


def test_sequence_match_one_shuffle(spark, sf_dir):
    facts = audit_of(spark, sf_dir, "q212_event_sequence_match")
    assert facts.n_exchanges == 1
    assert "Window" not in facts.text


def test_ahash_band_recall_pigeonhole():
    """A pair within Hamming ≤ 3 of 48 bits MUST collide on at least one of
    the 4 12-bit bands (4 bands, ≤3 flipped bits — pigeonhole). This is the
    recall-1.0 claim of q210's production gate, checked over randomized
    flips with a fixed seed."""
    rng = random.Random(0xA4A5)
    for _ in range(2000):
        h = rng.getrandbits(48)
        n_flips = rng.randint(0, 3)
        flipped = h
        for pos in rng.sample(range(48), n_flips):
            flipped ^= 1 << pos
        bands_equal = [
            ((h >> (12 * b)) & 0xFFF) == ((flipped >> (12 * b)) & 0xFFF)
            for b in range(4)
        ]
        assert any(bands_equal), (hex(h), hex(flipped), n_flips)


def test_min_cost_supplier_broadcasts_dims(spark, sf_dir):
    # Q2 shape: part/supplier/nation/region must broadcast; the only big
    # shuffle is the (part, supp) partial agg — and never a cartesian
    facts = audit_of(spark, sf_dir, "q216_min_cost_supplier")
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 4
    assert not facts.has_cartesian


def test_important_stock_global_threshold_broadcast(spark, sf_dir):
    # Q11 shape: the one-row global total must broadcast into the theta
    # filter (BroadcastNestedLoopJoin over a single row is the decorrelated
    # scalar subquery — cheap by construction), never a shuffled join
    facts = audit_of(spark, sf_dir, "q219_important_stock")
    assert (
        facts.join_strategies.get("BroadcastNestedLoopJoin", 0)
        + facts.join_strategies.get("BroadcastHashJoin", 0)
        >= 1
    )
    assert "SortMergeJoin" not in facts.join_strategies or (
        facts.join_strategies.get("SortMergeJoin", 0) == 0
    )


def test_promo_revenue_pushdown(spark, sf_dir):
    # Q14 shape: the shipdate range must reach the lineitem scan
    facts = audit_of(spark, sf_dir, "q217_promo_revenue")
    assert any("l_shipdate" in f for f in facts.pushed_filters)
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1
