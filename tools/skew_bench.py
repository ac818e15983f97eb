"""Adversarial-skew benchmark: measure the salted join against the
unsalted shuffled join on a dataset with a manufactured zipfian head.

    python tools/make_scaled_sf.py --out .scaledata/sf1skew \
        --replicas 10 --hot-key-pct 0.2
    python tools/skew_bench.py --sf-dir .scaledata/sf1skew

Why this harness exists: ``salted_join`` has an oracle parity check
(salted_join_parity) proving the rewrite is CORRECT, but until round 8
no artifact showed it is ever FASTER — and at 100 TB it is skew, not
volume, that kills shuffled-join plans (one reducer receives
p x |fact| rows no matter how many executors exist). This measures the
three plans a production pipeline chooses between on a skewed key:

  unsalted      sort-merge join, AQE skew split OFF — the naive plan;
                the hot key's partition serializes p of the fact table
                through one task.
  aqe_skew      the same join with AQE's skew-split ON, thresholds
                lowered to fire at bench scale (at 100 TB the DEFAULT
                256 MB threshold fires naturally; at sf1 the hot
                partition is only tens of MB, so without the override
                AQE silently does nothing — which is itself the lesson:
                AQE skew-split has a floor, explicit salting does not).
  salted        operators.joins.salted_join — deterministic fact-side
                salt, dim replicated n_salts ways; the hot key's rows
                spread over n_salts tasks in ANY Spark version/config.

Broadcast is disabled throughout (autoBroadcastJoinThreshold=-1): at
these SFs every dim fits in memory and a broadcast join would sidestep
skew entirely — the harness models the 100 TB regime where the build
side does NOT fit (the only regime where salting is the right tool;
salted_join's own docstring says broadcast wins when it fits).

Workload: lineitem JOIN part ON l_partkey -> agg revenue per p_brand
(the --hot-key-pct rewrite points ~p of l_partkey at one part), and
orders JOIN customer ON o_custkey -> agg per c_mktsegment. Results of
all three variants are asserted identical before timings are reported.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from etl_seattle_call_data_spark.operators.joins import hot_salted_join, salted_join
from etl_seattle_call_data_spark.session import get_spark
from etl_seattle_call_data_spark.sources.registry import load_table


def _workloads(spark, sf_dir: str, n_salts: int):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def li_unsalted() -> DataFrame:
        return (
            li.join(part.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey")
            .groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n"),
                # exact integer cents: double summation is order-dependent
                # and the three variants sum in different orders (rule 1)
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("bigint")
                ).alias("rev_cents"),
            )
        )

    def li_salted() -> DataFrame:
        return (
            salted_join(
                li,
                part.withColumnRenamed("p_partkey", "l_partkey"),
                ["l_partkey"],
                salt_by="l_orderkey",
                n_salts=n_salts,
            )
            .groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("bigint")
                ).alias("rev_cents"),
            )
        )

    def ord_unsalted() -> DataFrame:
        return (
            orders.join(cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                    "rev_cents"
                ),
            )
        )

    def ord_salted() -> DataFrame:
        return (
            salted_join(
                orders,
                cust.withColumnRenamed("c_custkey", "o_custkey"),
                ["o_custkey"],
                salt_by="o_orderkey",
                n_salts=n_salts,
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                    "rev_cents"
                ),
            )
        )

    def li_hot_salted() -> DataFrame:
        return (
            hot_salted_join(
                li,
                part.withColumnRenamed("p_partkey", "l_partkey"),
                ["l_partkey"],
                salt_by="l_orderkey",
                n_salts=n_salts,
            )
            .groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("bigint")
                ).alias("rev_cents"),
            )
        )

    def ord_hot_salted() -> DataFrame:
        return (
            hot_salted_join(
                orders,
                cust.withColumnRenamed("c_custkey", "o_custkey"),
                ["o_custkey"],
                salt_by="o_orderkey",
                n_salts=n_salts,
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                    "rev_cents"
                ),
            )
        )

    return {
        "lineitem_x_part": (li_unsalted, li_salted, li_hot_salted),
        "orders_x_customer": (ord_unsalted, ord_salted, ord_hot_salted),
    }


def _time(build, reps: int) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        build().count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def _rows(df: DataFrame) -> list:
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=".scaledata/sf1skew")
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ns = ap.parse_args()

    spark = get_spark()
    conf = spark.conf
    # model the cant-broadcast regime (see module docstring)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # make AQE's byte thresholds commensurate with bench-scale data so
    # the aqe_skew variant is a fair fight (defaults: 256 MB factor-5)
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    out: dict[str, dict[str, float]] = {}
    for wl_name, (unsalted, salted, hot_salted) in _workloads(
        spark, ns.sf_dir, ns.n_salts
    ).items():
        # correctness parity first: all four variants, identical rows
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        base_rows = _rows(unsalted())
        assert _rows(salted()) == base_rows, f"{wl_name}: salted rows diverge"
        assert _rows(hot_salted()) == base_rows, f"{wl_name}: hot-salted diverge"
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        assert _rows(unsalted()) == base_rows, f"{wl_name}: aqe rows diverge"

        timings: dict[str, float] = {}
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timings["unsalted"] = _time(unsalted, ns.reps)
        timings["salted"] = _time(salted, ns.reps)
        timings["hot_salted"] = _time(hot_salted, ns.reps)
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        timings["aqe_skew"] = _time(unsalted, ns.reps)
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timings["speedup_hot_salted_vs_unsalted"] = round(
            timings["unsalted"] / timings["hot_salted"], 2
        )
        out[wl_name] = timings
        print(f"# {wl_name}: {timings}", file=sys.stderr)

    print(json.dumps({"sf_dir": ns.sf_dir, "n_salts": ns.n_salts, "workloads": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
