"""Declarative data-quality expectations — the reusable operator behind
the dq_audit query: a rule list is evaluated against a frame in ONE
aggregation pass (plus one anti-join per referential rule), producing a
violations report row per rule.

Design for 100 TB: every column rule compiles to a conditional-count
expression inside a single `agg()` — one scan, map-side partials, no
per-rule job. Referential rules are key-only anti-joins (build side is
the referenced key set — broadcastable). Nothing collects but the
report (one row per rule).

The operator returns DATA (a report DataFrame), not an exception —
gating is the caller's policy (`assert_expectations` raises on any
violation for pipeline use).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str          # not_null | unique | in_range | in_set | custom | foreign_key
    column: str | None = None
    predicate: Column | None = None           # custom: rows VIOLATE when predicate is true
    ref: DataFrame | None = None              # foreign_key: referenced frame
    ref_column: str | None = None


def not_null(column: str) -> Rule:
    return Rule(name=f"not_null:{column}", kind="not_null", column=column)


def unique(column: str) -> Rule:
    return Rule(name=f"unique:{column}", kind="unique", column=column)


def in_range(column: str, lo, hi) -> Rule:
    return Rule(
        name=f"in_range:{column}[{lo},{hi}]",
        kind="custom",
        column=column,
        predicate=~F.col(column).between(lo, hi) & F.col(column).isNotNull(),
    )


def in_set(column: str, values) -> Rule:
    return Rule(
        name=f"in_set:{column}",
        kind="custom",
        column=column,
        predicate=~F.col(column).isin(*values) & F.col(column).isNotNull(),
    )


def violates_when(name: str, predicate: Column) -> Rule:
    """Rows VIOLATE the expectation when ``predicate`` is true."""
    return Rule(name=name, kind="custom", predicate=predicate)


def foreign_key(column: str, ref: DataFrame, ref_column: str) -> Rule:
    return Rule(
        name=f"foreign_key:{column}->{ref_column}",
        kind="foreign_key",
        column=column,
        ref=ref,
        ref_column=ref_column,
    )


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns a report frame
    (rule, n_violations, n_rows, passed) with one row per rule."""
    spark = df.sparkSession
    agg_rules = [r for r in rules if r.kind in ("not_null", "custom")]
    exprs = [F.count(F.lit(1)).alias("__n_rows")]
    for r in agg_rules:
        bad = F.col(r.column).isNull() if r.kind == "not_null" else r.predicate
        exprs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(r.name))
    base = df.agg(*exprs).first()
    n_rows = base["__n_rows"]

    report: list[tuple[str, int]] = [(r.name, int(base[r.name])) for r in agg_rules]

    for r in rules:
        if r.kind == "unique":
            dupes = (
                df.groupBy(r.column)
                .count()
                .filter(F.col("count") > 1)
                .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)))
                .first()[0]
            )
            report.append((r.name, int(dupes)))
        elif r.kind == "foreign_key":
            orphans = df.select(F.col(r.column)).filter(
                F.col(r.column).isNotNull()
            ).join(
                r.ref.select(F.col(r.ref_column).alias(r.column)).distinct(),
                r.column,
                "left_anti",
            ).count()
            report.append((r.name, int(orphans)))

    order = {r.name: i for i, r in enumerate(rules)}
    report.sort(key=lambda t: order[t[0]])
    return spark.createDataFrame(
        [(name, n, n_rows, n == 0) for name, n in report],
        "rule string, n_violations long, n_rows long, passed boolean",
    )


def assert_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Gate form: raises ValueError listing every failed rule; returns
    the report when all pass."""
    report = check_expectations(df, rules)
    failed = [r for r in report.collect() if not r.passed]
    if failed:
        msg = "; ".join(f"{r.rule}: {r.n_violations} violations" for r in failed)
        raise ValueError(f"data-quality expectations failed: {msg}")
    return report
