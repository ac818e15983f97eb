"""Semantic unit tests for the extended operators: temporal joins
(as-of, bounded range) and the rolling-hash fingerprint — hand-checked
answers on constructed inputs, complementing the oracle-parity gate."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.operators import joins, text


def _ts(minute: int, second: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture(scope="module")
def clicks_and_buys(spark):
    clicks = spark.createDataFrame(
        [
            (100, 1, _ts(0)),
            (101, 1, _ts(5)),
            (102, 1, _ts(5)),  # tie on ts with 101 → max event_id wins
            (103, 2, _ts(30)),
        ],
        ["event_id", "user_id", "ts"],
    )
    buys = spark.createDataFrame(
        [
            (200, 1, _ts(5)),   # at-or-before: ties with clicks 101/102
            (201, 1, _ts(4)),   # only click 100 precedes
            (202, 2, _ts(10)),  # user 2: no click yet → unmatched
            (203, 3, _ts(10)),  # user 3: no clicks at all
        ],
        ["event_id", "user_id", "ts"],
    )
    return clicks, buys


def test_asof_join_backward_with_ties(clicks_and_buys):
    clicks, buys = clicks_and_buys
    out = joins.asof_join(
        buys, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        tie_col="event_id", right_payload=["event_id", "ts"], prefix="c_",
    )
    got = {r.event_id: r.c_event_id for r in out.collect()}
    assert got == {200: 102, 201: 100, 202: None, 203: None}


def test_asof_join_keeps_left_columns(clicks_and_buys):
    clicks, buys = clicks_and_buys
    out = joins.asof_join(
        buys, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        tie_col="event_id", right_payload=["event_id"], prefix="c_",
    )
    assert set(out.columns) == {"event_id", "user_id", "ts", "c_event_id"}
    assert out.count() == buys.count()  # left-outer: every left row survives


def test_range_join_count_window(clicks_and_buys):
    clicks, buys = clicks_and_buys
    # clicks in the strictly-preceding 6 minutes
    out = joins.range_join_count(
        buys, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_offset_s=-360, upper_offset_s=0, left_id="event_id",
        count_alias="n_clicks",
    )
    got = {r.event_id: r.n_clicks for r in out.collect()}
    # buy 200 @12:05: clicks 100 (12:00, ≥ -6min) — 101/102 AT 12:05 are
    # excluded by the half-open upper bound
    assert got == {200: 1, 201: 1, 202: 0, 203: 0}


def test_range_join_bucket_boundary(spark):
    # right row exactly at left_ts + lower lands in the other bucket —
    # the 2-bucket explode must still find it
    left = spark.createDataFrame([(1, 7, _ts(10))], ["id", "user_id", "ts"])
    right = spark.createDataFrame([(7, _ts(0)), (7, _ts(9, 59))], ["user_id", "ts"])
    out = joins.range_join_count(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_offset_s=-600, upper_offset_s=0, left_id="id",
    )
    assert out.collect()[0].n_matches == 2  # 12:00:00 inclusive, 12:09:59 in


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma"), (4, "")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.roll_hash for r in text.rolling_fingerprint(df).collect()}
    assert got[1] == got[3]  # deterministic
    assert got[1] != got[2]  # order-sensitive, unlike the md5 bag fingerprint
    assert got[4] == 0  # empty doc → fold identity
    assert all(0 <= v < text.ROLLHASH_MOD for v in got.values())


def test_ivf_topk_probes_own_cell(spark):
    from etl_seattle_call_data_spark.operators import similarity

    # 4 tight clusters around orthogonal-ish axes; centroids = ids 0-3
    base = [
        [10.0, 0.0, 0.0, 0.0],
        [0.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 0.0],
        [0.0, 0.0, 0.0, 10.0],
    ]
    rows = [(i, [x + 0.0 for x in base[i]]) for i in range(4)]
    rows += [(10 + i, [x * 0.9 + 0.1 for x in base[i]]) for i in range(4)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter("vec_id < 4")
    out = similarity.ivf_topk(emb, queries, k=1, n_cells=4)
    got = {r.query_id: r.neighbor_id for r in out.collect()}
    # each centroid's nearest in-cell neighbor is its own cluster member
    assert got == {0: 10, 1: 11, 2: 12, 3: 13}


def test_range_join_rejects_empty_window(clicks_and_buys):
    clicks, buys = clicks_and_buys
    import pytest

    with pytest.raises(ValueError, match="upper_offset_s"):
        joins.range_join_count(
            buys, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
            lower_offset_s=0, upper_offset_s=0, left_id="event_id",
        )


def test_range_join_pre_epoch_timestamps(spark):
    # negative epoch micros: truncate-toward-zero DIV would bucket-mismatch
    # the two sides around t=0; floor semantics must keep the match
    left = spark.createDataFrame(
        [(1, 7, "1969-12-31 23:59:30")], ["id", "user_id", "s"]
    ).withColumn("ts", F.col("s").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, "1969-12-31 23:59:00"), (7, "1969-12-31 23:58:00")], ["user_id", "s"]
    ).withColumn("ts", F.col("s").cast("timestamp"))
    out = joins.range_join_count(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_offset_s=-60, upper_offset_s=0, left_id="id",
    )
    assert out.collect()[0].n_matches == 1  # 23:59:00 in [−60s, 0s), 23:58:00 out


def test_merge_partial_aggs_equals_full_recompute(spark):
    """merge(agg(base), agg(delta)) must equal agg(full) exactly —
    including keys present in only one side."""
    from etl_seattle_call_data_spark.operators import cdc
    from pyspark.sql import functions as F

    rows = [("a", 1), ("a", 2), ("b", 3), ("c", 5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    base_rows = df.filter(F.col("v") <= 2)   # only 'a'
    delta_rows = df.filter(F.col("v") > 2)   # 'b' and 'c' are delta-only

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    merged = cdc.merge_partial_aggs(agg(base_rows), agg(delta_rows), ["k"], ["sv"])
    full = agg(df)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
