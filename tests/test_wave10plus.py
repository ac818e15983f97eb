"""Semantic invariants for the wave 10-14 queries — properties the
oracle hash-compare cannot express (it proves Spark == DuckDB, not
that both satisfy the metric's contract). All run on sf0.001.
"""

from __future__ import annotations

import pytest

from etl_seattle_call_data_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[name].spark(spark, sf).collect()


def test_leakage_split_partitions_and_zero_leaks(spark):
    rows = _run(spark, "leakage_safe_split")
    assert {r["split_name"] for r in rows} <= {"train", "val", "test"}
    assert all(r["leaked_clusters"] == 0 for r in rows)
    n_docs = sum(r["n_docs"] for r in rows)
    import duckdb

    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert n_docs == truth  # splits partition the corpus exactly


def test_position_attribution_credit_conservation(spark):
    # total ppm credit across event types must equal 1e6 * n_purchases
    # with >=1 preceding touch — the exact-sum contract of the U-shape
    rows = _run(spark, "attribution_position_based")
    total_ppm = sum(r["credit_ppm_total"] for r in rows)
    assert total_ppm % 1_000_000 == 0
    assert total_ppm > 0


def test_search_ranking_metrics_bounds(spark):
    rows = _run(spark, "search_ranking_metrics")
    for r in rows:
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert r["rr_ppm"] in (0,) or 200_000 <= r["rr_ppm"] <= 1_000_000
        assert 0 <= r["n_rel_found"] <= 5


def test_cuped_variance_reduction_bounds(spark):
    rows = _run(spark, "cuped_adjusted_estimate")
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["var_reduction"] <= 1.0  # it's corr^2
        assert r["n_users"] > 0


def test_qini_deciles_are_equidepth(spark):
    rows = _run(spark, "qini_uplift_deciles")
    sizes = sorted(r["n_treat"] + r["n_ctrl"] for r in rows)
    assert len(rows) == 10
    assert sizes[-1] - sizes[0] <= 1  # NTILE contract


def test_incremental_mv_always_matches(spark):
    rows = _run(spark, "incremental_mv_join_delta")
    assert rows and all(r["matches"] for r in rows)


def test_mergeable_srm_chi2_consistency(spark):
    rows = _run(spark, "experiment_srm_check")
    r = rows[0]
    na, nb = r["n_arm_a"], r["n_arm_b"]
    assert r["chi2_micro"] == (1_000_000 * (na - nb) ** 2) // (na + nb)


def test_pareto_topk_share_at_least_80pct(spark):
    rows = _run(spark, "pareto_8020_analysis")
    for r in rows:
        assert r["topk_share_ppm"] >= 800_000
        assert 1 <= r["k_for_80"] <= r["n_customers"]


def test_neyman_allocation_sums_within_budget(spark):
    rows = _run(spark, "neyman_allocation_plan")
    assert sum(r["alloc_10k"] for r in rows) <= 10_000  # floor rounding only
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000


def test_k_threshold_release_suppresses_small_cells(spark):
    rows = _run(spark, "k_threshold_suppression_release")
    named = [r for r in rows if r["seg"] != "OTHER"]
    assert all(r["n_customers"] >= 20 for r in named)
    assert sum(1 for r in rows if r["seg"] == "OTHER") == 1


def test_scd2_pit_shares_sum_to_one(spark):
    rows = _run(spark, "scd2_point_in_time")
    total = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000  # DIV truncation


def test_weekly_churn_rates_bounded(spark):
    rows = _run(spark, "weekly_churn_rates")
    for r in rows:
        assert 0 <= r["n_churned"] <= r["n_active"]
        assert 0 <= r["churn_ppm"] <= 1_000_000


@pytest.mark.parametrize(
    "name",
    ["language_id_confusion", "recsys_diversity_eval", "qq_table_segments"],
)
def test_wave_queries_nonempty_at_smoke_sf(spark, name):
    assert len(_run(spark, name)) > 0
