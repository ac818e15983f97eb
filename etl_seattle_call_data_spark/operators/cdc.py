"""Change-data-capture primitives: snapshot diff and batch upsert.

``snapshot_diff`` answers "what changed between two snapshots of the
same keyed table" — the feed for incremental downstream loads when the
upstream can only hand over full extracts (exactly the reference's
situation: its batch pipeline re-reads the full CSV every run,
/root/reference/ETL_Pipeline_Batch/extract.py:100-134, and its streaming
half exists to avoid that). One full-outer join on the key, change
classification from null-sides + value comparison; the join shuffles
keys + compared columns only.

``upsert_snapshot`` is the batch face of the streaming
``KeyedUpsertSink`` semantics: fold a change batch into a keyed table,
last-write-wins — a MERGE INTO without a table format, usable on plain
DataFrames.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows added / removed / changed from ``old`` to ``new`` (unchanged
    rows are filtered out — the usual CDC contract). Comparison is
    null-safe per column over ``compare_cols`` (default: all shared
    non-key columns)."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c in old.columns and c not in key_cols]
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"o.{k}") == F.col(f"n.{k}") for k in key_cols]
    )
    j = o.join(n, cond, "full_outer")
    old_missing = F.col(f"o.{key_cols[0]}").isNull()
    new_missing = F.col(f"n.{key_cols[0]}").isNull()
    differs = (
        reduce(
            lambda a, b: a | b,
            [~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
        )
        if compare_cols
        else F.lit(False)
    )
    change = (
        F.when(old_missing, F.lit("added"))
        .when(new_missing, F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return (
        j.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def upsert_snapshot(
    current: DataFrame | None,
    batch: DataFrame,
    key: str,
    order_col: str,
) -> DataFrame:
    """Batch MERGE: fold ``batch`` into ``current`` keeping the newest
    row per key by ``order_col`` (ties keep the batch row). The
    DataFrame-level core of streaming/sinks.py::KeyedUpsertSink, exposed
    for batch pipelines that maintain keyed tables without a streaming
    query."""
    b = batch.withColumn("__src", F.lit(1))
    if current is None:
        merged = b
    else:
        merged = current.withColumn("__src", F.lit(0)).unionByName(
            b, allowMissingColumns=True
        )
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.desc("__src"))
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def merge_partial_aggs(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental materialized-view maintenance for algebraic
    aggregates: ``base`` (the stored agg table) and ``delta`` (the agg
    of only the new rows) merge by re-summing per key — valid because
    SUM and COUNT are commutative monoids, so agg(full) ≡
    merge(agg(old), agg(new)) exactly (decimal sums keep it exact even
    for money columns).

    This is the O(|delta| + |affected keys|) refresh path that replaces
    an O(|table|) recompute when a day of data lands in a 100 TB fact:
    only the delta is scanned; the merge shuffles the two (small) agg
    tables, never the facts. Averages and other derived ratios must be
    re-derived from the merged sums/counts — never merged directly.
    """
    both = base.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum(count_col).alias(count_col),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Batch CDC MERGE (the Delta/Iceberg ``MERGE INTO ... WHEN MATCHED
    [AND op='D'] DELETE / UPDATE / INSERT`` shape, engine-portable):
    fold an insert/update/delete change stream into ``base``, keeping
    each key's LATEST change by ``seq_cols`` (must order totally within
    a key — include a unique column). A latest-change delete removes the
    key; otherwise the latest change row replaces the base row (or
    inserts a new key). Base rows for untouched keys pass through.

    Scale: one window shuffle over the (delta-sized) change stream, one
    left-anti join of base against the touched keys — base is never
    shuffled beyond the join, and at warehouse scale the touched-key
    side is the small one (broadcastable by AQE)."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in seq_cols])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = base.join(latest.select(key), key, "left_anti")
    # Result schema = base schema: change-stream metadata (op, extra seq
    # columns) is not state and must not leak into the merged table.
    applied = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
    return untouched.unionByName(applied)
