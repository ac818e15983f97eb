"""Semantic invariants for the wave 21-24 queries — properties the
oracle hash-compare cannot express (it proves Spark == DuckDB, not
that both satisfy the statistic's contract). All run on sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_seattle_call_data_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    return REGISTRY[name].spark(spark, sf).collect()


# --- wave 21 ---------------------------------------------------------------


def test_anova_f_nonnegative_and_eta_in_unit(spark):
    (r,) = _run(spark, "anova_oneway_fstat")
    assert r["n_groups"] == 5
    assert r["ss_between"] >= 0.0
    assert r["ss_within"] >= 0.0
    assert r["f_stat"] >= 0.0
    assert 0.0 <= r["eta_squared"] <= 1.0


def test_weekday_chi2_counts_cover_all_orders(spark):
    rows = _run(spark, "weekday_uniformity_chi2")
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == truth
    for r in rows:
        assert r["chi2_stat"] >= 0.0


def test_pocket_price_waterfall_identity(spark):
    rows = _run(spark, "pocket_price_waterfall")
    assert len(rows) == 25  # TPC-H brand count
    for r in rows:
        # gross - leakage + tax == pocket, to fixed-point cents
        assert r["pocket_revenue"] == pytest.approx(
            r["gross"] - r["discount_leakage"] + r["tax_added"], abs=0.02
        )
        assert 0 < r["pocket_ppm"] < 2_000_000


def test_keyset_pagination_is_true_page3(spark):
    rows = _run(spark, "keyset_pagination_page3")
    assert len(rows) == 10
    truth = duckdb.sql(
        f"""
        SELECT o_orderkey FROM '{SF_SMOKE}/orders.parquet'
        ORDER BY round(o_totalprice * 100) DESC, o_orderkey
        LIMIT 10 OFFSET 20
        """
    ).fetchall()
    assert [r["o_orderkey"] for r in rows] == [t[0] for t in truth]


def test_lag_features_precede_label(spark):
    rows = _run(spark, "timeseries_lag_feature_matrix")
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for series in by_user.values():
        series.sort(key=lambda r: r["wk"])
        for i, r in enumerate(series):
            # lag1 either sentinel or the previous OBSERVED week's value
            if i == 0:
                assert r["lag1"] == -1
            if i + 1 < len(series):
                assert r["label_next_week"] == series[i + 1]["v"]
            assert 0 <= r["trail3_n"] <= 3


def test_process_capability_relationships(spark):
    rows = _run(spark, "process_capability_leadtime")
    for r in rows:
        assert r["sd_days"] > 0.0
        assert r["cp"] > 0.0
        # Cpk <= Cp always (mean off-center can only shrink capability)
        assert r["cpk"] <= r["cp"] + 1e-12


# --- wave 22 ---------------------------------------------------------------


def test_welch_df_between_min_and_sum(spark):
    (r,) = _run(spark, "welch_t_urgent_vs_low")
    n1, n2 = r["n_urgent"], r["n_low"]
    # Welch-Satterthwaite df lies in [min(n1,n2)-1, n1+n2-2]
    assert min(n1, n2) - 1 <= r["welch_df"] <= n1 + n2 - 2


def test_compaction_plan_partitions_docs_exactly(spark):
    rows = _run(spark, "file_compaction_plan")
    truth = duckdb.sql(
        f"""SELECT source, COUNT(*), SUM(n_chars)
            FROM '{SF_SMOKE}/documents.parquet' GROUP BY source"""
    ).fetchall()
    by_source = {}
    for r in rows:
        agg = by_source.setdefault(r["source"], [0, 0])
        agg[0] += r["n_docs"]
        agg[1] += r["n_chars"]
        assert r["first_doc"] <= r["last_doc"]
    for src, n_docs, n_chars in truth:
        assert by_source[src] == [n_docs, n_chars]
    # bins within a source never overlap in doc_id ranges
    for src in by_source:
        spans = sorted(
            (r["file_id"], r["first_doc"], r["last_doc"])
            for r in rows
            if r["source"] == src
        )
        for (f1, _, hi), (f2, lo, _) in zip(spans, spans[1:]):
            assert f1 < f2 and hi < lo


def test_bollinger_bands_ordered(spark):
    rows = _run(spark, "bollinger_breakout_daily")
    assert rows
    for r in rows:
        assert r["band_lower"] <= r["band_mid"] <= r["band_upper"]
        assert not (r["breakout_up"] and r["breakout_down"])


def test_jackknife_variance_nonnegative(spark):
    (r,) = _run(spark, "jackknife_nation_mean")
    assert r["n_groups"] == 25
    assert r["var_jk_dollars2"] >= 0.0
    assert r["se_jk_dollars"] == pytest.approx(
        r["var_jk_dollars2"] ** 0.5
    )


def test_cochran_armitage_chi2_nonnegative(spark):
    (r,) = _run(spark, "cochran_armitage_trend")
    assert r["chi2_trend"] >= 0.0
    assert 0 < r["n_returned"] < r["n_lines"]


def test_chow_sse_split_never_exceeds_pooled(spark):
    (r,) = _run(spark, "chow_test_break")
    # adding a break point can only reduce (or keep) total SSE
    assert r["sse_split"] <= r["sse_pooled"] + 1e-9
    assert r["chow_f"] >= 0.0


# --- wave 23 ---------------------------------------------------------------


def test_chapman_estimate_bounds(spark):
    rows = _run(spark, "capture_recapture_chapman")
    assert len(rows) == 5
    for r in rows:
        # N_hat is at least the observed union, never below either capture
        union_lo = max(r["n_first_half"], r["n_second_half"])
        assert r["n_hat"] >= union_lo - 1
        assert r["n_recaptured"] <= min(
            r["n_first_half"], r["n_second_half"]
        )
        assert r["var_hat"] >= 0.0


def test_chain_ladder_factors_positive(spark):
    rows = _run(spark, "chain_ladder_factors")
    assert rows
    for r in rows:
        # cumulative revenue never shrinks, so every factor >= 1
        assert r["c_next"] >= r["c_curr"]
        assert r["dev_factor"] >= 1.0
        assert r["factor_ppm"] >= 1_000_000


def test_pearson_residuals_margin_identity(spark):
    rows = _run(spark, "pearson_residual_cells")
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["observed"] for r in rows) == truth
    # expected counts reproduce N too (margins identity)
    assert sum(r["expected"] for r in rows) == pytest.approx(truth, rel=1e-9)


def test_collocation_lift_support_and_order(spark):
    rows = _run(spark, "bigram_collocation_lift")
    assert 0 < len(rows) <= 20
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["c_xy"] >= 20
        assert r["c_x"] >= r["c_xy"] and r["c_y"] >= r["c_xy"]


def test_sankey_step_totals_monotone(spark):
    rows = _run(spark, "sankey_event_paths_depth3")
    per_step = {}
    for r in rows:
        per_step[r["step"]] = per_step.get(r["step"], 0) + r["n_transitions"]
    # users drop out of the funnel monotonically by step
    steps = sorted(per_step)
    assert steps[0] == 1
    for a, b in zip(steps, steps[1:]):
        assert per_step[b] <= per_step[a]


def test_cents_digits_cover_orders(spark):
    (r,) = _run(spark, "cents_digit_uniformity")
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchone()[0]
    assert r["n_orders"] == truth
    assert 1 <= r["n_digits_observed"] <= 100
    assert r["chi2_stat"] >= 0.0


# --- wave 24 ---------------------------------------------------------------


def test_huber_between_min_and_max_toward_median(spark):
    rows = _run(spark, "huber_one_step_location")
    assert len(rows) == 5
    for r in rows:
        # the M-estimate stays within one k of the median by construction
        k = 1994 * r["mad_cents"] // 1000
        assert abs(r["huber_cents"] - r["median_cents"]) <= max(k, 1)


def test_topk_turnover_bounds(spark):
    (r,) = _run(spark, "topk_turnover_footrule")
    assert r["n_common"] <= min(r["n_top_first"], r["n_top_second"])
    assert 0 <= r["jaccard_ppm"] <= 1_000_000
    # footrule over common items is at most sum of max displacements
    assert 0 <= r["footrule_common"] <= r["n_common"] * 19


def test_littles_law_window_interior(spark):
    (r,) = _run(spark, "littles_law_audit")
    assert r["window_start_day"] < r["window_end_day"]
    assert r["l_avg"] > 0.0 and r["lambda_day"] > 0.0 and r["w_mean"] >= 1.0
    # identity holds up to boundary truncation: gap is small vs L
    assert abs(r["identity_gap"]) <= r["l_avg"]


def test_heaps_blocks_monotone_in_block_size(spark):
    rows = _run(spark, "heaps_law_blocks")
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for series in by_source.values():
        series.sort(key=lambda r: r["block_size"])
        for a, b in zip(series, series[1:]):
            assert b["n_types"] >= a["n_types"]  # vocab only grows
        for r in series:
            assert 1 <= r["n_types"] <= r["block_size"]


def test_mahalanobis_top10_sorted_positive(spark):
    rows = _run(spark, "mahalanobis_outliers_2d")
    assert len(rows) == 10
    d2s = [r["d2"] for r in rows]
    assert d2s == sorted(d2s, reverse=True)
    assert all(d >= 0.0 for d in d2s)


def test_two_way_effects_reconstruct_cell_mean(spark):
    rows = _run(spark, "two_way_effects_decomposition")
    assert len(rows) == 125
    for r in rows:
        # decomposition identity is exact in fixed point
        assert (
            r["grand_mean_micro"]
            + r["nation_effect_micro"]
            + r["priority_effect_micro"]
            + r["interaction_micro"]
            == r["cell_mean_micro"]
        )
