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
