"""Semantic invariants for the wave 25 queries. All run on sf0.001."""

from __future__ import annotations

import duckdb

from etl_seattle_call_data_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[name].spark(spark, sf).collect()


def test_kruskal_wallis_h_nonnegative_and_counts(spark):
    (r,) = _run(spark, "kruskal_wallis_leadtime")
    assert r["n_groups"] == 5
    assert r["h_stat"] >= 0.0
    # H is bounded above by n - 1 (attained when groups are perfectly
    # separated); with ties it can only shrink
    assert r["h_stat"] <= r["n_lines"]


def test_friedman_chi2_in_range(spark):
    (r,) = _run(spark, "friedman_test_nation_blocks")
    assert r["n_blocks"] == 25
    assert r["n_treatments"] == 5
    # chi2_F in [0, b*k*(k-1)... ] — loose sanity: max is b(k-1) scale
    assert -1e-9 <= r["chi2_friedman"] <= 25 * 4 + 1e-9


def test_weekday_decomposition_seven_rows(spark):
    rows = _run(spark, "weekday_seasonal_decomposition")
    assert len(rows) == 7
    assert sorted(r["dow"] for r in rows) == list(range(7))
    ppm = {r["explained_ppm"] for r in rows}
    assert len(ppm) == 1  # global column constant across rows
    assert all(r["residual_mad"] >= 0 for r in rows)
    truth = duckdb.sql(
        f"""SELECT COUNT(DISTINCT epoch_us(o_orderdate) // 86400000000)
            FROM '{SF_SMOKE}/orders.parquet'"""
    ).fetchone()[0]
    assert sum(r["n_days"] for r in rows) == truth


def test_expected_shortfall_below_var(spark):
    (r,) = _run(spark, "expected_shortfall_daily")
    assert r["k_tail"] == max(r["n_days"] // 20, 1)
    # the mean of the k worst days cannot exceed the k-th worst day
    assert r["es_dollars"] <= r["var_dollars"] + 1e-9
    assert r["es_micro_dollars"] <= r["var_dollars"] * 1_000_000


def test_vshape_patterns_are_real_vees(spark):
    rows = _run(spark, "vshape_pattern_census")
    assert len(rows) <= 5
    drops = [r["drop_dollars"] for r in rows]
    assert drops == sorted(drops, reverse=True)
    for r in rows:
        # strict down-run then strict up-run of >=2 days each
        assert r["down_len"] >= 2 and r["up_len"] >= 2
        assert r["drop_dollars"] > 0 and r["recovery_dollars"] > 0


def test_rolling_slope_full_windows_only(spark):
    rows = _run(spark, "rolling_ols_slope_30d")
    truth = duckdb.sql(
        f"""SELECT COUNT(DISTINCT epoch_us(o_orderdate) // 86400000000)
            FROM '{SF_SMOKE}/orders.parquet'"""
    ).fetchone()[0]
    assert len(rows) == truth - 29
    for r in rows:
        assert r["rising"] == (r["slope_per_day"] > 0.0)


# --- wave 26 ---------------------------------------------------------------


def test_bradley_terry_accounting(spark):
    rows = _run(spark, "bradley_terry_one_step")
    assert len(rows) == 25
    # every duel produces exactly one win: total wins == total games / 2
    assert sum(r["wins"] for r in rows) * 2 == sum(r["games"] for r in rows)
    for r in rows:
        assert 0 <= r["bt_rating_ppm"] <= 2_000_000


def test_winnowing_fingerprints_shared(spark):
    rows = _run(spark, "winnowing_fingerprint_census")
    for r in rows:
        assert r["n_docs"] >= 2
        assert 1 <= r["n_sources"] <= r["n_docs"]


def test_price_dispersion_ordering_and_bounds(spark):
    rows = _run(spark, "price_dispersion_by_part")
    spreads = [r["spread_ppm"] for r in rows]
    assert spreads == sorted(spreads, reverse=True)
    for r in rows:
        assert r["min_cents"] <= r["max_cents"]
        assert r["n_lines"] >= 5


def test_nelson_aalen_monotone(spark):
    rows = _run(spark, "nelson_aalen_second_order")
    rows.sort(key=lambda r: r["gap_days"])
    prev_h, prev_n = -1, None
    for r in rows:
        assert r["cum_hazard_ppb"] >= prev_h  # cumulative hazard grows
        prev_h = r["cum_hazard_ppb"]
        if prev_n is not None:
            assert r["n_risk"] <= prev_n  # risk set shrinks
        prev_n = r["n_risk"]
        assert r["n_events"] <= r["n_risk"]


def test_location_quotients_above_parity(spark):
    rows = _run(spark, "shift_share_location_quotient")
    lqs = [r["lq_ppm"] for r in rows]
    assert lqs == sorted(lqs, reverse=True)
    # top specializations over-index: LQ > 1e6 means above global share
    assert lqs[0] >= 1_000_000


def test_month_end_loading_shares(spark):
    rows = _run(spark, "month_end_loading")
    for r in rows:
        assert 28 <= r["days_in_month"] <= 31
        assert 0 <= r["rev_last3"] <= r["rev_total"]
        assert 0 <= r["last3_ppm"] <= 1_000_000


# --- wave 27 ---------------------------------------------------------------


def test_sequential_pattern_grid(spark):
    rows = _run(spark, "sequential_pattern_support")
    assert len(rows) == 20  # 5 types, ordered pairs, a != b
    for r in rows:
        assert 0 <= r["support"] <= r["n_users_both"]
        assert 0 <= r["support_ppm"] <= 1_000_000


def test_power_analysis_monotone_in_mde(spark):
    rows = _run(spark, "power_analysis_two_proportion")
    assert len(rows) == 15
    by_p = {}
    for r in rows:
        by_p.setdefault(r["priority"], []).append(r)
    for series in by_p.values():
        series.sort(key=lambda r: r["mde_ppm"])
        ns = [r["n_per_arm"] for r in series]
        # bigger detectable effect -> smaller required sample
        assert ns == sorted(ns, reverse=True)
        assert all(n >= 1 for n in ns)


def test_rbo_within_unit_interval(spark):
    (r,) = _run(spark, "rank_biased_overlap_topk")
    assert 0 <= r["n_common"] <= 20
    assert 0 <= r["rbo_ppb"] <= 1_000_000_000
    if r["n_common"] == 0:
        assert r["rbo_ppb"] == 0


def test_burstiness_at_least_unity(spark):
    rows = _run(spark, "term_burstiness_church_gale")
    for r in rows:
        # cf >= df always, so burstiness ppm >= 1e6
        assert r["burstiness_ppm"] >= 1_000_000
        assert r["cf"] >= r["df"]


def test_simpsons_scan_flags_consistent(spark):
    rows = _run(spark, "simpsons_paradox_scan")
    assert len(rows) == 25
    overall = {r["overall_rd_ppm"] for r in rows}
    assert len(overall) == 1
    for r in rows:
        if r["sign_reversal"]:
            assert r["rd_ppm"] * r["overall_rd_ppm"] < 0


def test_vwap_bounds(spark):
    rows = _run(spark, "vwap_monthly_by_brand")
    for r in rows:
        assert r["total_qty"] > 0
        assert 0 < r["vwap_cents"] <= r["total_cents"]


# --- wave 28 ---------------------------------------------------------------


def test_did_placebo_cells_cover_orders(spark):
    (r,) = _run(spark, "did_placebo_test")
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchone()[0]
    assert r["n_treated"] + r["n_control"] == truth
    assert r["placebo_smaller"] == (
        abs(r["placebo_did_dollars"]) < abs(r["real_did_dollars"])
    )


def test_session_sensitivity_monotone(spark):
    rows = _run(spark, "session_timeout_sensitivity")
    rows.sort(key=lambda r: r["timeout_s"])
    ns = [r["n_sessions"] for r in rows]
    # longer timeout merges sessions: counts weakly decrease
    assert ns == sorted(ns, reverse=True)
    eps = [r["events_per_session_ppm"] for r in rows]
    assert eps == sorted(eps)


def test_sortkey_rle_matches_global_lag(spark):
    rows = _run(spark, "sortkey_rle_advisor")
    assert len(rows) == 8
    # sorting BY a column gives it (near-)minimal runs: under by_ship_day
    # the ship_day column has runs == distinct days
    truth = duckdb.sql(
        f"""SELECT COUNT(DISTINCT epoch_us(l_shipdate) // 86400000000)
            FROM '{SF_SMOKE}/lineitem.parquet'"""
    ).fetchone()[0]
    by = {(r["ordering"], r["col_name"]): r["n_runs"] for r in rows}
    assert by[("by_ship_day", "ship_day")] == truth
    for r in rows:
        assert 1 <= r["n_runs"] <= r["n_rows"]


def test_feed_staleness_reference_type(spark):
    rows = _run(spark, "feed_staleness_slo")
    assert len(rows) == 5
    # at least one type holds the global max ts: staleness 0
    assert min(r["staleness_min"] for r in rows) == 0
    for r in rows:
        assert r["staleness_min"] >= 0
        assert r["slo_fresh_60m"] == (r["staleness_min"] <= 60)


def test_cannibalization_r_in_range(spark):
    rows = _run(spark, "brand_cannibalization_pairs")
    rs = [r["pearson_r"] for r in rows]
    assert rs == sorted(rs)
    for r in rows:
        assert -1.0 - 1e-12 <= r["pearson_r"] <= 1.0 + 1e-12
        assert r["brand_a"] < r["brand_b"]


def test_fano_nation_coverage(spark):
    rows = _run(spark, "overdispersion_fano_index")
    assert len(rows) == 25
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/customer.parquet'"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == truth
    for r in rows:
        assert r["fano_ppm"] >= 0
        assert r["overdispersed"] == (r["fano_ppm"] > 1_000_000)


# --- wave 29 ---------------------------------------------------------------


def test_obf_boundaries_decreasing(spark):
    rows = _run(spark, "group_sequential_obrien_fleming")
    rows.sort(key=lambda r: r["look"])
    assert [r["look"] for r in rows] == [1, 2, 3, 4, 5]
    crits = [r["critical"] for r in rows]
    assert crits == sorted(crits, reverse=True)
    # sample sizes accumulate
    ns = [r["n_treat"] + r["n_control"] for r in rows]
    assert ns == sorted(ns)


def test_ransac_consensus_bounds(spark):
    (r,) = _run(spark, "ransac_line_daily")
    assert 2 <= r["n_inliers"] <= r["n_days"]  # anchors are inliers
    assert 0 <= r["inlier_ppm"] <= 1_000_000
    assert r["anchor_day1"] < r["anchor_day2"]


def test_deming_slope_exceeds_ols_attenuation(spark):
    (r,) = _run(spark, "deming_regression_daily")
    # Deming corrects OLS attenuation: |slope| >= |OLS slope| on the
    # same data (both positive here: more orders, more revenue)
    import duckdb as d

    ols = d.sql(
        f"""
        WITH dd AS (
          SELECT COUNT(*) AS x,
                 SUM(CAST(round(o_totalprice) AS BIGINT)) // 1000 AS y
          FROM '{SF_SMOKE}/orders.parquet'
          GROUP BY epoch_us(o_orderdate) // 86400000000
        )
        SELECT regr_slope(y, x) FROM dd
        """
    ).fetchone()[0]
    assert r["deming_slope"] >= ols - 1e-9


def test_adf_tstat_negative_for_mean_reverting(spark):
    (r,) = _run(spark, "adf_unit_root_test")
    # daily aggregates of i.i.d.-ish totals are strongly mean-reverting
    assert r["gamma_hat"] < 0
    assert r["stationary_95"] == (r["t_stat"] < -2.86)


def test_participation_ratio_bounds(spark):
    (r,) = _run(spark, "embedding_participation_ratio")
    assert r["n_dims"] == 64
    assert 1.0 <= r["pr_effective_dims"] <= 64.0


def test_aging_buckets_cover_orders(spark):
    rows = _run(spark, "ar_aging_buckets")
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == truth
    assert {r["age_bucket"] for r in rows} <= {"0-30", "31-60", "61-90", "91+"}


# --- wave 30 ---------------------------------------------------------------


def test_adstock_dominates_today(spark):
    rows = _run(spark, "adstock_geometric_decay")
    for r in rows:
        # adstock includes today's revenue at full weight (minus the
        # ppb truncation), plus non-negative carryover
        assert r["adstock_kilo"] >= r["revenue_kilo"] - 1


def test_haar_energy_split(spark):
    (r,) = _run(spark, "haar_energy_decomposition")
    assert r["approx_energy"] > 0 and r["detail_energy"] >= 0
    assert 0 <= r["detail_share_ppm"] <= 1_000_000


def test_jarque_bera_components(spark):
    (r,) = _run(spark, "jarque_bera_normality")
    assert r["jb_stat"] >= 0.0
    assert r["kurtosis"] > 0.0
    assert r["non_normal_95"] == (r["jb_stat"] > 5.99)


def test_variance_ratio_positive(spark):
    (r,) = _run(spark, "variance_ratio_test")
    assert r["variance_ratio"] > 0.0
    assert r["n_diffs_1d"] == r["n_diffs_5d"] + 4
    assert r["mean_reverting"] == (r["variance_ratio"] < 1.0)


def test_retention_rates_and_sentinel(spark):
    (r,) = _run(spark, "retention_d1_d7_predictive")
    assert 0.0 <= r["mean_d1_rate"] <= 1.0
    assert 0.0 <= r["mean_d7_rate"] <= 1.0
    # either a real correlation or the documented degenerate sentinel
    assert r["pearson_r"] == -2.0 or -1.0 <= r["pearson_r"] <= 1.0
