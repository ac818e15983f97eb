"""Property-based (hypothesis) model checks for the two-phase ranking
operators: the distributed grouped rank / prefix sum must agree with a
plain-Python reference (sorted-order rank and cumulative sum) on
ARBITRARY generated data — duplicate order keys, empty groups,
single-row groups, skewed buckets — not just the oracle dataset. The
coarse bucket width is drawn too, since correctness must hold for ANY
order-aligned bucketing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.operators import ranking


@st.composite
def grouped_rows(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        g = draw(st.integers(min_value=0, max_value=3))
        v = draw(st.integers(min_value=0, max_value=1000))
        w = draw(st.integers(min_value=0, max_value=9))
        rows.append((g, i, v, w))  # (group, unique id, value, weight)
    width = draw(st.sampled_from([1, 7, 64, 1000, 5000]))
    return rows, width


def _model_rank(rows):
    out = {}
    by_g = {}
    for g, i, v, w in rows:
        by_g.setdefault(g, []).append((v, i))
    for g, vs in by_g.items():
        for r, (v, i) in enumerate(sorted(vs), start=1):
            out[i] = r
    return out


def _model_cumsum(rows):
    out = {}
    by_g = {}
    for g, i, v, w in rows:
        by_g.setdefault(g, []).append((v, i, w))
    for g, vs in by_g.items():
        run = 0
        for v, i, w in sorted(vs):
            run += w
            out[i] = run
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(grouped_rows())
def test_grouped_two_phase_rank_matches_model(spark, case):
    rows, width = case
    df = spark.createDataFrame(rows, "g int, id int, v int, w int")
    got = {
        r.id: r.rk
        for r in ranking.two_phase_rank_in_groups(
            df,
            group_cols=["g"],
            order_by=["v", "id"],
            coarse=F.expr(f"v DIV {width}"),
            rank_name="rk",
        ).collect()
    }
    assert got == _model_rank(rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(grouped_rows())
def test_grouped_two_phase_cumsum_matches_model(spark, case):
    rows, width = case
    df = spark.createDataFrame(rows, "g int, id int, v int, w int")
    got = {
        r.id: r.cumw
        for r in ranking.two_phase_cumsum_in_groups(
            df,
            group_cols=["g"],
            order_by=["v", "id"],
            coarse=F.expr(f"v DIV {width}"),
            weight=F.col("w"),
            cum_name="cumw",
        ).collect()
    }
    assert got == _model_cumsum(rows)


def _model_global_rank(rows, key):
    # rows: (g, id, v, w); rank by (key(row), id) globally, 1-based
    order = sorted(rows, key=lambda r: (key(r), r[1]))
    return {r[1]: i for i, r in enumerate(order, start=1)}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(grouped_rows())
def test_two_phase_multi_rank_matches_single_rank(spark, case):
    """multi_rank over k specs must equal k independent two_phase_rank
    passes (same offsets arithmetic, one materialization barrier)."""
    rows, width = case
    df = spark.createDataFrame(rows, "g int, id int, v int, w int")
    ranked, total = ranking.two_phase_multi_rank(
        df,
        [
            (["v", "id"], F.expr(f"v DIV {width}"), "rv"),
            (["w", "id"], F.expr("w DIV 3"), "rw"),
            (["g", "id"], F.expr("g"), "rg"),
        ],
    )
    got = {r.id: (r.rv, r.rw, r.rg) for r in ranked.collect()}
    assert total == len(rows)
    mv = _model_global_rank(rows, lambda r: r[2])
    mw = _model_global_rank(rows, lambda r: r[3])
    mg = _model_global_rank(rows, lambda r: r[0])
    assert got == {i: (mv[i], mw[i], mg[i]) for i in mv}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=1, max_value=60), st.sampled_from([1, 3, 5, 8]))
def test_equidepth_bucket_grouped_matches_scalar(spark, n, k):
    """Column-typed NTILE must equal the driver-scalar variant (ANSI
    NTILE contract) for every rank 1..n."""
    df = spark.range(1, n + 1).select(
        F.col("id").alias("rank"), F.lit(n).cast("long").alias("n")
    )
    got = {
        r.rank: (r.g, r.s)
        for r in df.select(
            "rank",
            ranking.equidepth_bucket_grouped(F.col("rank"), F.col("n"), k).alias("g"),
            ranking.equidepth_bucket(F.col("rank"), n, k).alias("s"),
        ).collect()
    }
    assert all(g == s for g, s in got.values()), got
