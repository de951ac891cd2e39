"""PromQL expression frontend (promql_expr.py): parser AST shapes, instant
and range evaluation composed from the promql primitives."""

from __future__ import annotations

import pytest

from tsdb_parquet_spark.matchers import Matcher
from tsdb_parquet_spark.promql_expr import (
    Agg,
    BinOp,
    PromQLEngine,
    RangeFn,
    Scalar,
    Selector,
    TopK,
    parse_duration_ms,
    parse_expr,
    query_instant,
    query_range,
)


def test_parse_durations():
    assert parse_duration_ms("5m") == 300_000
    assert parse_duration_ms("90s") == 90_000
    assert parse_duration_ms("2h") == 7_200_000
    with pytest.raises(ValueError):
        parse_duration_ms("5x")


def test_parse_selector_and_rate():
    n = parse_expr('rate(http_requests{job="prom",code!="500"}[5m])')
    assert isinstance(n, RangeFn) and n.fn == "rate" and n.window_ms == 300_000
    assert n.arg.matchers[0] == Matcher("=", "name", "http_requests")
    assert Matcher("!=", "code", "500") in n.arg.matchers


def test_parse_agg_topk_binop():
    n = parse_expr("topk(3, sum by (handler) (rate(m[1m])) / 60)")
    assert isinstance(n, TopK) and n.k == 3
    assert isinstance(n.arg, BinOp) and n.arg.op == "/"
    assert isinstance(n.arg.left, Agg) and n.arg.left.by == ["handler"]
    assert isinstance(n.arg.right, Scalar) and n.arg.right.value == 60.0


def test_parse_errors():
    for bad in ("sum by (h) (", "rate(m)", "topk(, m)", "m + "):
        with pytest.raises(ValueError):
            parse_expr(bad)


@pytest.fixture()
def mini(spark):
    rows = [
        # two counter series under one handler, one under another
        (t * 1000, float(v), "req", h, c)
        for h, c, series in [
            ("/a", "200", [0, 10, 20, 30]),
            ("/a", "500", [0, 1, 2, 3]),
            ("/b", "200", [0, 100, 200, 300]),
        ]
        for t, v in enumerate(series)
    ]
    return spark.createDataFrame(
        rows,
        "time long, value double, label_name string, label_handler string, "
        "label_code string",
    )


def test_instant_selector_and_scalar_op(spark, mini):
    out = query_instant(mini, 'req{handler="/a"} * 2', at_ms=3000)
    got = {(r["label_handler"], r["label_code"]): r["value"] for r in out.collect()}
    assert got == {("/a", "200"): 60.0, ("/a", "500"): 6.0}


def test_instant_sum_by_rate(spark, mini):
    # rate over the full 3 s span: /a: (30+3)/3 = 11, /b: 300/3 = 100
    out = query_instant(mini, "sum by (handler) (rate(req[1m]))", at_ms=3000)
    got = {r["label_handler"]: round(r["value"], 6) for r in out.collect()}
    assert got == {"/a": 11.0, "/b": 100.0}


def test_instant_topk(spark, mini):
    out = query_instant(mini, "topk(2, req)", at_ms=3000)
    got = [(r["label_handler"], r["label_code"], r["value"]) for r in out.collect()]
    assert got == [("/b", "200", 300.0), ("/a", "200", 30.0)]


def test_instant_vector_division(spark, mini):
    # share of each series within its handler total
    out = query_instant(mini, "req / sum by (handler) (req)", at_ms=3000)
    got = {(r["label_handler"], r["label_code"]): round(r["value"], 4)
           for r in out.collect()}
    assert got[("/a", "200")] == round(30 / 33, 4)
    assert got[("/a", "500")] == round(3 / 33, 4)
    assert got[("/b", "200")] == 1.0


def test_range_selector_matches_range_query(spark, mini):
    from tsdb_parquet_spark.promql import range_query

    expr_out = query_range(mini, "req", 0, 4000, 1000)
    prim_out = range_query(mini, 0, 4000, 1000).drop("sample_time")
    assert expr_out.exceptAll(prim_out).count() == 0
    assert prim_out.exceptAll(expr_out).count() == 0


def test_range_avg_over_time_grid(spark, mini):
    out = query_range(mini, 'avg_over_time(req{handler="/b"}[2s])', 0, 3000, 1000)
    got = {r["step_ts"]: r["value"] for r in out.collect()}
    # window (t-2000, t]: at 0 -> avg(0); 1000 -> avg(0,100); 2000 ->
    # avg(100,200); 3000 -> avg(200,300)
    assert got == {0: 0.0, 1000: 50.0, 2000: 150.0, 3000: 250.0}


def test_engine_rejects_scalar_only(spark, mini):
    eng = PromQLEngine(mini)
    with pytest.raises(ValueError):
        eng.eval_instant("2", 0)


def test_scalar_functions(spark, mini):
    out = query_instant(mini, 'clamp(req{handler="/a"}, 5, 25)', at_ms=3000)
    got = {(r["label_handler"], r["label_code"]): r["value"] for r in out.collect()}
    assert got == {("/a", "200"): 25.0, ("/a", "500"): 5.0}

    out2 = query_instant(mini, "abs(req - 100)", at_ms=3000)
    got2 = {(r["label_handler"], r["label_code"]): r["value"] for r in out2.collect()}
    assert got2[("/b", "200")] == 200.0 and got2[("/a", "200")] == 70.0

    # scalar fn over a RANGE evaluation keeps the grid column
    rng = query_range(mini, 'floor(req{handler="/b"} / 60)', 0, 3000, 1000)
    vals = {r["step_ts"]: r["value"] for r in rng.collect()}
    assert vals == {0: 0.0, 1000: 1.0, 2000: 3.0, 3000: 5.0}


def test_scalar_fn_parse_errors():
    with pytest.raises(ValueError):
        parse_expr("clamp(m, 5)")  # needs 2 args
    with pytest.raises(ValueError):
        parse_expr("abs(m, 5)")  # takes none


def test_aggregate_without(spark, mini):
    out = query_instant(mini, "sum without (code) (req)", at_ms=3000)
    got = {(r["label_name"], r["label_handler"]): r["value"] for r in out.collect()}
    assert got == {("req", "/a"): 33.0, ("req", "/b"): 300.0}

    # without over a range keeps step_ts as a grouping key
    rng = query_range(mini, "sum without (code, name) (req)", 2000, 3000, 1000)
    got2 = {(r["label_handler"], r["step_ts"]): r["value"] for r in rng.collect()}
    assert got2[("/a", 3000)] == 33.0
    assert got2[("/b", 2000)] == 200.0

    # without on an absent label is a no-op
    out3 = query_instant(mini, "sum without (nope) (req)", at_ms=3000)
    assert out3.count() == 3


def test_parse_on_and_histogram_quantile():
    from tsdb_parquet_spark.promql_expr import HistogramQuantile

    n = parse_expr("m / on (handler, job) sum by (handler) (m)")
    assert isinstance(n, BinOp) and n.on == ["handler", "job"]

    h = parse_expr("histogram_quantile(0.9, http_duration_bucket)")
    assert isinstance(h, HistogramQuantile) and h.q == 0.9
    assert isinstance(h.arg, Selector)


def test_binop_on_matches_implicit(spark, mini):
    implicit = query_instant(mini, "req / sum by (handler) (req)", at_ms=3000)
    explicit = query_instant(mini, "req / on (handler) sum by (handler) (req)",
                             at_ms=3000)
    assert implicit.exceptAll(explicit).count() == 0
    assert explicit.exceptAll(implicit).count() == 0


def test_histogram_quantile_expression(spark):
    rows = [
        (0, 10.0, "hist", "/x", "1"), (0, 30.0, "hist", "/x", "2"),
        (0, 40.0, "hist", "/x", "+Inf"),
        (0, 5.0, "hist", "/y", "1"), (0, 5.0, "hist", "/y", "2"),
        (0, 10.0, "hist", "/y", "+Inf"),
    ]
    df = spark.createDataFrame(
        rows, "time long, value double, label_name string, "
        "label_handler string, label_le string",
    )
    out = query_instant(df, "histogram_quantile(0.5, hist)", at_ms=0)
    got = {r["label_handler"]: r["value"] for r in out.collect()}
    assert got["/x"] == 1.5  # interpolated inside (1,2]
    assert got["/y"] == 1.0  # rank 5 == first bucket count -> its le

    # range evaluation keeps the grid
    rng = query_range(df, "histogram_quantile(0.5, hist)", 0, 60_000, 60_000)
    assert {r["step_ts"] for r in rng.collect()} == {0, 60_000}


def test_offset_modifier(spark, mini):
    from tsdb_parquet_spark.promql_expr import RangeFn as RF

    n = parse_expr("req offset 1s")
    assert isinstance(n, Selector) and n.offset_ms == 1000
    r = parse_expr("rate(req[1m] offset 2s)")
    assert isinstance(r, RF) and r.arg.offset_ms == 2000

    # instant: `req offset 1s` at t=3000 == plain req at t=2000
    shifted = query_instant(mini, 'req{handler="/b"} offset 1s', at_ms=3000)
    plain = query_instant(mini, 'req{handler="/b"}', at_ms=2000)
    assert shifted.collect() == plain.collect()

    # ratio-to-past: current / offset — classic growth expression
    growth = query_instant(mini, 'req{handler="/b"} / req{handler="/b"} offset 1s',
                           at_ms=3000)
    assert growth.collect()[0]["value"] == 1.5  # 300/200

    # range: the offset series reports under the CALLER's step axis
    rng = {r["step_ts"]: r["value"]
           for r in query_range(mini, 'req{handler="/b"} offset 1s',
                                1000, 3000, 1000).collect()}
    assert rng == {1000: 0.0, 2000: 100.0, 3000: 200.0}
