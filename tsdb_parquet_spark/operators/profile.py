"""Table profiling — the data-quality summary (Deequ/Great-Expectations
territory) an ingest pipeline runs before accepting a batch: per column,
null counts, exact distinct cardinality, and numeric ranges, in ONE pass
over the data.

Shape: a single aggregate row computes every column's statistics at once
(count/sum-of-null-flags/min/max are plain aggregates; the exact
distincts make Catalyst plan ONE Expand — multi-distinct is one pass,
not one scan per column), then the wide row unpivots to the (column,
stats) report via an exploded struct array — metadata-sized output.  At
100 TB swap ``exact_distinct=False`` to ``approx_count_distinct`` (HLL,
mergeable, no Expand) — the report shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """One row per column: dtype, row/null/distinct counts, numeric
    min/max (NULL for non-numeric columns — cross-engine string
    renderings of timestamps/structs don't agree, numbers do)."""
    from pyspark.sql.types import NumericType

    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("_n")]
    cols = df.schema.fields
    for f in cols:
        c = F.col(f.name)
        aggs.append(
            F.sum(c.isNull().cast("long")).alias(f"_null_{f.name}")
        )
        d = (
            F.countDistinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(d.alias(f"_dist_{f.name}"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"_min_{f.name}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{f.name}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{f.name}").alias("n_nulls"),
                F.col(f"_dist_{f.name}").alias("n_distinct"),
                (
                    F.col(f"_min_{f.name}")
                    if isinstance(f.dataType, NumericType)
                    else F.lit(None).cast("double")
                ).alias("min_v"),
                (
                    F.col(f"_max_{f.name}")
                    if isinstance(f.dataType, NumericType)
                    else F.lit(None).cast("double")
                ).alias("max_v"),
            )
            for f in cols
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select("_r.*")
