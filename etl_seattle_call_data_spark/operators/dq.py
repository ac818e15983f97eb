"""Declarative data-quality expectations — the reusable operator behind
the dq_audit query: a rule list compiles to ONE lazy Catalyst plan whose
report (one row per rule) materializes in a single Spark action.

Design for 100 TB: every column rule (not_null / range / set / custom
predicate) becomes a conditional-count expression inside a single
``agg()`` — one scan, map-side partials, no per-rule job. Uniqueness
rules add one groupBy over the key column; referential rules add one
key-only anti-join (build side is the referenced key set —
broadcastable). The per-rule scalar rows are then stitched together
with broadcast one-row joins and a generator unpivot, so NOTHING runs
until the caller acts on the report — six rules is one job, not six
(the driver-side-orchestration anti-pattern the round-3 audit query
exhibited and this rewrite retires).

The operator returns DATA (a lazy report DataFrame), not an exception —
gating is the caller's policy (`assert_expectations` collects and raises
on any violation).
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


# --------------------------------------------------------------------------
# Lazy scalar building blocks (each: a ONE-ROW frame; combined by
# broadcast joins so any number of them still collapses into one action)


def scalar_join(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """Stitch one-row frames into one wide one-row frame via broadcast
    nested-loop joins (1-row build sides — never CartesianProduct)."""
    out = first
    for frame in rest:
        out = out.crossJoin(F.broadcast(frame))
    return out


def fk_orphan_count(
    df: DataFrame, column: str, ref: DataFrame, ref_column: str, alias: str
) -> DataFrame:
    """Lazy one-row count of ``df`` rows whose non-null ``column`` has no
    match in ``ref.ref_column`` — the key-only anti-join (both sides
    prune to the key column; the distinct reference key set is the
    broadcastable build side)."""
    keys = ref.select(F.col(ref_column).alias(column)).filter(
        F.col(column).isNotNull()
    ).distinct()
    return (
        df.select(column)
        .filter(F.col(column).isNotNull())
        .join(keys, column, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias(alias))
    )


def duplicate_key_count(
    df: DataFrame, column: str, alias: str, count_keys: bool = False
) -> DataFrame:
    """Lazy one-row duplication measure over ``column``: excess rows
    (sum of count-1, default — 0 means unique) or, with ``count_keys``,
    the number of DISTINCT key values appearing more than once."""
    grouped = df.groupBy(column).agg(F.count(F.lit(1)).alias("__n")).filter(
        F.col("__n") > 1
    )
    measure = (
        F.count(F.lit(1)) if count_keys
        else F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
    )
    return grouped.agg(measure.cast("long").alias(alias))


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Compile all rules into ONE lazy plan; returns a report frame
    (rule, n_violations, n_rows, passed) with one row per rule, in rule
    order. Nothing executes until the caller acts on the report."""
    names = [r.name for r in rules]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"duplicate rule names would silently collapse in the report: "
            f"{sorted(dupes)}"
        )

    agg_rules = [r for r in rules if r.kind in ("not_null", "custom")]
    exprs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for i, r in enumerate(agg_rules):
        bad = F.col(r.column).isNull() if r.kind == "not_null" else r.predicate
        exprs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"__v{i}")
        )
    base = df.agg(*exprs)
    n_rows_row = base.select("__n_rows")

    pieces: list[DataFrame] = []
    if agg_rules:
        # unpivot the single agg row into (rule, n_violations) via stack —
        # one Generate over one row, n_rows rides along
        stack_args = ", ".join(
            f"'{r.name}', __v{i}" for i, r in enumerate(agg_rules)
        )
        pieces.append(
            base.select(
                F.expr(
                    f"stack({len(agg_rules)}, {stack_args}) "
                    "AS (rule, n_violations)"
                ),
                "__n_rows",
            )
        )
    for r in rules:
        if r.kind == "unique":
            one = duplicate_key_count(df, r.column, "n_violations")
        elif r.kind == "foreign_key":
            one = fk_orphan_count(df, r.column, r.ref, r.ref_column, "n_violations")
        else:
            continue
        pieces.append(
            scalar_join(one, n_rows_row).select(
                F.lit(r.name).alias("rule"), "n_violations", "__n_rows"
            )
        )

    order = {r.name: i for i, r in enumerate(rules)}
    when_idx = F.create_map(
        *[F.lit(x) for kv in order.items() for x in kv]
    )[F.col("rule")]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return (
        out.withColumn("__idx", when_idx)
        .orderBy("__idx")
        .select(
            "rule",
            "n_violations",
            F.col("__n_rows").alias("n_rows"),
            (F.col("n_violations") == 0).alias("passed"),
        )
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


# --------------------------------------------------------------------------
# Zero-cost pipeline metrics via df.observe (Spark Observation API)


def observed(df: DataFrame, name: str, **metrics: Column):
    """Attach named aggregate metrics to ``df`` that materialize as a
    side effect of whatever action the caller ALREADY runs — the
    Spark-native replacement for the count-per-stage anti-pattern
    (each .count() re-runs the pipeline prefix; an Observation rides
    the existing job for free, accumulated map-side like any agg).

    Returns (observed_df, observation); read ``observation.get`` AFTER
    an action on ``observed_df``. Metrics must be aggregate expressions
    (count/sum/min/max...). At 100 TB this is the only sane way to get
    per-stage row counts out of a multi-stage corpus build: one job,
    metrics for every stage.

    >>> gated, obs = observed(df.filter(ok), "quality_gate",
    ...                       n_kept=F.count(F.lit(1)))
    >>> gated.write.parquet(out)   # the one real action
    >>> obs.get["n_kept"]
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("observed() needs at least one metric kwarg")
    obs = Observation(name)
    first, *rest = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, first, *rest), obs
