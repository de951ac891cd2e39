"""Python UDTFs — table-valued functions for the SQL surface
(SURVEY.md §2.2 "UDF/UDAF/UDTF"; Spark 4 `spark.udtf.register`).

UDTFs run driver-defined Python per input row and can emit many rows —
the right tool for *small-cardinality expansion of scalar arguments*
(parsing a query literal, generating probe lists), NOT for data-path
transforms (those stay in built-ins / Pandas UDFs; a per-row Python hop
on 100 TB of rows is the anti-pattern, SURVEY.md §2.1 R21 note).

``parse_selector`` as a UDTF makes the PromQL frontend available from
pure SQL::

    SELECT t.* FROM parse_promql('up{job="prometheus"}') t
    -- name | op | value rows, joinable against the wide label columns
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="name: string, op: string, value: string")
class ParseSelector:
    """Explode a PromQL instant-vector selector literal into matcher rows."""

    def eval(self, selector: str):  # noqa: D102
        from ..matchers import parse_selector

        for m in parse_selector(selector):
            yield m.name, m.op, m.value


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs for SQL use."""
    spark.udtf.register("parse_promql", ParseSelector)
