"""Data-profiling operators — corpus QA before a training run.

Single-pass summary statistics shaped for Catalyst: ONE aggregation
job computes every column's stats (count/nulls/distinct/min/max),
then a zero-cost stack() unpivots to one row per column. Exact
distinct counts expand to one aggregate per column (Spark's Expand);
at 100 TB swap ``exact_distinct=False`` to use HLL sketches
(approx_count_distinct, one pass, mergeable state) — the exact
variant exists because it is engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str], exact_distinct: bool = True
) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_nulls, n_distinct,
    min_str, max_str). min/max are cast to string so heterogeneous
    column types share one output schema."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            (
                F.countDistinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
    )


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles: list[float],
) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    — the order-statistics aggregate, not the t-digest approximation).
    Exact percentiles need the per-group value multiset; at 100 TB
    prefer ``percentile_approx`` (mergeable sketch, bounded memory) —
    this exact form is the oracle-checkable reference."""
    exprs = [
        F.percentile(F.col(value_col), F.lit(p)).alias(f"p{int(p * 100):02d}")
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*exprs)
