"""The map-predicate → wide-column REDIRECT (SURVEY.md §4 optional
extension 1): matcher queries over the HYBRID layout (hot labels wide,
long-tail labels in one canonical map) must resolve each label to its
cheapest physical form — wide column (pushable) when materialized, map
entry (post-scan) otherwise, typed NULL when absent — and produce
exactly the answers the pure-wide layout gives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.matchers import Matcher, hybrid_label_col
from tsdb_parquet_spark.tables import TSDB_PATH
from tsdb_parquet_spark.timeseries import (
    apply_matchers,
    ensure_hybrid_label_layout,
    query_selector,
    select_series,
)


@pytest.fixture()
def hybrid_mini(spark):
    """Hot label ``name`` wide; ``instance``/``quantile`` in the map."""
    rows = [
        (1000, 1.0, "up", {"instance": "a:9090"}),
        (2000, 0.5, "latency", {"instance": "a:9090", "quantile": "0.5"}),
        (3000, 0.9, "latency", {"instance": "b:9090", "quantile": "0.99"}),
        (4000, 2.0, "up", {"instance": "b:9090"}),
    ]
    return spark.createDataFrame(
        rows,
        "time long, value double, label_name string, "
        "labels map<string,string>",
    )


def test_accessor_resolution_order(hybrid_mini):
    col_fn = hybrid_label_col(hybrid_mini)
    # hot → wide column; cold → map entry; absent → typed NULL
    names = {r[0] for r in hybrid_mini.select(col_fn("name")).collect()}
    assert names == {"up", "latency"}
    insts = {r[0] for r in hybrid_mini.select(col_fn("instance")).collect()}
    assert insts == {"a:9090", "b:9090"}
    out = hybrid_mini.select(col_fn("nowhere").alias("x")).distinct().collect()
    assert [r["x"] for r in out] == [None]
    # the wide form resolves as a plain attribute (pushable), the map form
    # as element access — visible in the analyzed expression strings
    wide_expr = hybrid_mini.select(col_fn("name"))._jdf.queryExecution() \
        .analyzed().toString()
    map_expr = hybrid_mini.select(col_fn("instance"))._jdf.queryExecution() \
        .analyzed().toString()
    assert "label_name" in wide_expr
    assert "[instance]" in map_expr


def test_hybrid_matchers_mixed_forms(hybrid_mini):
    # one wide-resolved matcher AND one map-resolved matcher
    got = apply_matchers(
        hybrid_mini,
        [Matcher("=", "name", "up"), Matcher("=", "instance", "b:9090")],
        label_col=hybrid_label_col(hybrid_mini),
    ).select("time").collect()
    assert [r["time"] for r in got] == [4000]


def test_absent_label_semantics(hybrid_mini):
    col_fn = hybrid_label_col(hybrid_mini)
    # SQL 3VL: predicate on an absent label is NULL → drops every row
    assert (
        apply_matchers(
            hybrid_mini, [Matcher("=", "zone", "x")], label_col=col_fn
        ).count()
        == 0
    )
    # Prometheus: absent label == "" → negative matcher keeps all rows,
    # and an explicit empty-string equality matches everything
    assert (
        apply_matchers(
            hybrid_mini,
            [Matcher("!=", "zone", "x")],
            label_col=col_fn,
            null_semantics="prometheus",
        ).count()
        == 4
    )
    assert (
        apply_matchers(
            hybrid_mini,
            [Matcher("=", "zone", "")],
            label_col=col_fn,
            null_semantics="prometheus",
        ).count()
        == 4
    )


def test_map_only_layout_falls_back_to_map(spark):
    df = spark.createDataFrame(
        [(1, 1.0, {"job": "prom"})],
        "time long, value double, labels map<string,string>",
    )
    col_fn = hybrid_label_col(df)
    analyzed = df.select(col_fn("job"))._jdf.queryExecution().analyzed().toString()
    assert "[job]" in analyzed
    assert (
        apply_matchers(df, [Matcher("=", "job", "prom")], label_col=col_fn).count()
        == 1
    )


def test_at_rest_hybrid_redirect_pushdown_and_answer(spark):
    """The full §4-extension story on the real fixture: materialize the
    hybrid layout at rest, run q02's matchers through the redirect, and
    assert (a) the hot-label predicates reach the Parquet scan as
    PushedFilters, (b) the cold-label predicate does NOT (map access is
    never pushable), and (c) the answer equals the pure-wide path."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    wide = spark.read.option("mergeSchema", "true").parquet(TSDB_PATH)
    hybrid = ensure_hybrid_label_layout(
        spark,
        wide,
        hot=["name", "job"],
        table_name="tsdb_hybrid_test",
        source_paths=TSDB_PATH,
    )
    assert set(hybrid.columns) == {
        "time", "value", "label_name", "label_job", "labels",
    }
    matchers = [
        Matcher("=", "name", "up"),
        Matcher("=", "instance", "localhost:9090"),
        Matcher("=", "job", "prometheus"),
    ]
    t0, t1 = 1679383000000, 1679385000000
    redirected = select_series(
        hybrid,
        matchers=matchers,
        t0=t0,
        t1=t1,
        label_col=hybrid_label_col(hybrid),
        project_labels=[],
    )
    plan = redirected._jdf.queryExecution().executedPlan().toString()
    pushed = plan[plan.index("PushedFilters"):].split("]")[0]
    for frag in ("EqualTo(label_name,up", "EqualTo(label_job,prometheus",
                 "GreaterThan(time", "LessThan(time"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    assert "label_instance" not in pushed  # cold label: evaluated post-scan
    assert "[instance]" in plan  # ... as map element access in the Filter

    baseline = select_series(
        wide, matchers=matchers, t0=t0, t1=t1, project_labels=[]
    )
    got = sorted((r["time"], r["value"]) for r in redirected.collect())
    want = sorted((r["time"], r["value"]) for r in baseline.collect())
    assert got == want and len(got) > 0


def test_query_selector_is_layout_aware(spark):
    wide = spark.read.option("mergeSchema", "true").parquet(TSDB_PATH)
    hybrid = ensure_hybrid_label_layout(
        spark,
        wide,
        hot=["name", "job"],
        table_name="tsdb_hybrid_test",
        source_paths=TSDB_PATH,
    )
    sel = 'up{job="prometheus", instance="localhost:9090"}'
    got = sorted(
        (r["time"], r["value"])
        for r in query_selector(hybrid, sel).select("time", "value").collect()
    )
    want = sorted(
        (r["time"], r["value"])
        for r in query_selector(wide, sel).select("time", "value").collect()
    )
    assert got == want and len(got) > 0
