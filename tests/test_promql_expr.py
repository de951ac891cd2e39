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


def test_binop_group_right_mirrors_group_left(spark, mini):
    # one-to-many: the aggregate is the ONE (left) side, the series the
    # MANY (right) side — group_right keeps the many side's label set
    gr = query_instant(
        mini, "sum by (handler) (req) / on (handler) group_right req",
        at_ms=3000,
    )
    got = {(r["label_handler"], r["label_code"]): r["value"] for r in gr.collect()}
    # /a total 33: 33/30 = 1.1, 33/3 = 11; /b total 300: 300/300 = 1
    assert got == {("/a", "200"): 1.1, ("/a", "500"): 11.0, ("/b", "200"): 1.0}
    # and it mirrors the swapped group_left form with the value inverted
    gl = query_instant(
        mini, "req / on (handler) group_left sum by (handler) (req)",
        at_ms=3000,
    )
    inv = {(r["label_handler"], r["label_code"]): 1.0 / r["value"]
           for r in gl.collect()}
    assert {k: round(v, 9) for k, v in got.items()} == {
        k: round(v, 9) for k, v in inv.items()}


def test_binop_group_right_filter_keeps_left_value(spark, mini):
    # Prometheus vectorElemBinop: a filtering comparison ALWAYS emits
    # the written LEFT operand's value; group_right only decides that
    # the label set comes from the many (right) side.  at t=3000:
    # totals /a=33 /b=300; series /a,200=30 /a,500=3 /b,200=300.
    out = query_instant(
        mini, "sum by (handler) (req) > on (handler) group_right req",
        at_ms=3000,
    )
    got = {(r["label_handler"], r["label_code"]): r["value"]
           for r in out.collect()}
    # /b: 300 > 300 is false; survivors carry the ONE side's value 33,
    # NOT the many side's 30 / 3
    assert got == {("/a", "200"): 33.0, ("/a", "500"): 33.0}
    # bool mod is unaffected: 0/1 per many-side row
    b = query_instant(
        mini, "sum by (handler) (req) > bool on (handler) group_right req",
        at_ms=3000,
    )
    gotb = {(r["label_handler"], r["label_code"]): r["value"]
            for r in b.collect()}
    assert gotb == {("/a", "200"): 1.0, ("/a", "500"): 1.0,
                    ("/b", "200"): 0.0}


def test_binop_group_left_carries_labels(spark, mini):
    # carried label: group_left(code) copies the ONE side's code label
    # onto every matched many-side row, overwriting the many side's own
    # (the Prometheus conflict rule).  many = req{code="200"}, one =
    # req{code="500"}, matched on handler.
    res = query_instant(
        mini,
        'req{code="200"} * on (handler) group_left (code) '
        'req{code="500"}',
        at_ms=3000,
    )
    rows = {(r["label_handler"], r["label_code"]): r["value"]
            for r in res.collect()}
    # only /a has a 500 series: 30 * 3 = 90, carried code = '500'
    assert rows == {("/a", "500"): 90.0}


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


# ---------------------------------------------------------------------------
# round-4 language extensions: parser


def test_parse_subquery_and_param_aggs():
    from tsdb_parquet_spark.promql_expr import Subquery

    n = parse_expr("max_over_time(rate(m[1m])[10m:1m])")
    assert isinstance(n, Subquery) and n.range_ms == 600_000 and n.step_ms == 60_000
    assert isinstance(n.arg, RangeFn) and n.arg.fn == "rate"

    # omitted step falls back to the documented 60s engine default
    d = parse_expr("avg_over_time(m[1h:])")
    assert isinstance(d, Subquery) and d.step_ms == 60_000

    b = parse_expr("bottomk(2, m)")
    assert isinstance(b, TopK) and b.bottom and b.k == 2
    t = parse_expr("topk by (h) (1, m)")
    assert t.by == ["h"] and not t.bottom

    q = parse_expr("quantile(0.5, m)")
    assert isinstance(q, Agg) and q.op == "quantile" and q.param == 0.5
    c = parse_expr('count_values("ver", m)')
    assert isinstance(c, Agg) and c.op == "count_values" and c.param == "ver"

    # trailing by-clause form
    s = parse_expr("sum(m) by (h)")
    assert isinstance(s, Agg) and s.by == ["h"]


def test_parse_cmp_set_ops_and_modifiers():
    from tsdb_parquet_spark.promql_expr import ScalarFn as SF

    n = parse_expr("m > bool 50")
    assert isinstance(n, BinOp) and n.op == ">" and n.bool_mod
    # precedence: or binds loosest
    n2 = parse_expr("m + m or m")
    assert n2.op == "or" and n2.left.op == "+"
    # comparison binds looser than arithmetic
    n3 = parse_expr("m + 1 > m * 2")
    assert n3.op == ">" and n3.left.op == "+" and n3.right.op == "*"

    neg = parse_expr("-m")
    assert isinstance(neg, SF) and neg.fn == "neg"
    assert parse_expr("-5").value == -5.0

    at = parse_expr("m @ 2.5")
    assert isinstance(at, Selector) and at.at_ms == 2500

    ign = parse_expr("m / ignoring (code) m")
    assert ign.ignoring == ["code"]

    gr = parse_expr("m / on (h) group_right m")
    assert gr.group_side == "right" and gr.group_labels == []
    gl = parse_expr("m * on (h) group_left (job, env) m")
    assert gl.group_side == "left" and gl.group_labels == ["job", "env"]
    with pytest.raises(ValueError):  # set ops take no group modifier
        parse_expr("m and on (h) group_right m")


# ---------------------------------------------------------------------------
# round-4 language extensions: evaluation


def test_agg_stddev_stdvar_group_quantile(spark, mini):
    # /a values at t=3s: {30, 3} -> mean 16.5, pop-std 13.5, var 182.25
    std = query_instant(mini, "stddev by (handler) (req)", 3000)
    assert {r["label_handler"]: r["value"] for r in std.collect()} == {
        "/a": 13.5, "/b": 0.0}
    var = query_instant(mini, "stdvar by (handler) (req)", 3000)
    assert {r["label_handler"]: r["value"] for r in var.collect()} == {
        "/a": 182.25, "/b": 0.0}
    grp = query_instant(mini, "group by (handler) (req)", 3000)
    assert {r["label_handler"]: r["value"] for r in grp.collect()} == {
        "/a": 1.0, "/b": 1.0}
    med = query_instant(mini, "quantile by (handler) (0.5, req)", 3000)
    assert {r["label_handler"]: r["value"] for r in med.collect()} == {
        "/a": 16.5, "/b": 300.0}


def test_count_values(spark, mini):
    # clamp to collapse 30 and 300 into one value bucket
    out = query_instant(mini, 'count_values("v", clamp_max(req, 30))', 3000)
    # aggregation drops all input labels: only the new label remains
    assert set(out.columns) == {"label_v", "value"}
    got = {r["label_v"]: r["value"] for r in out.collect()}
    assert got == {"30.0": 2.0, "3.0": 1.0}

    by = query_instant(mini, 'count_values by (handler) ("v", clamp_max(req, 30))', 3000)
    got2 = {(r["label_handler"], r["label_v"]): r["value"] for r in by.collect()}
    assert got2 == {("/a", "30.0"): 1.0, ("/a", "3.0"): 1.0, ("/b", "30.0"): 1.0}


def test_bottomk_and_topk_by(spark, mini):
    out = query_instant(mini, "bottomk(2, req)", 3000)
    assert {r["value"] for r in out.collect()} == {3.0, 30.0}
    per = query_instant(mini, "topk by (handler) (1, req)", 3000)
    got = {(r["label_handler"], r["value"]) for r in per.collect()}
    assert got == {("/a", 30.0), ("/b", 300.0)}


def test_comparison_filter_and_bool(spark, mini):
    out = query_instant(mini, "req > 50", 3000)
    assert [(r["label_handler"], r["value"]) for r in out.collect()] == [("/b", 300.0)]

    b = query_instant(mini, "req > bool 50", 3000)
    got = {(r["label_handler"], r["label_code"]): r["value"] for r in b.collect()}
    assert got == {("/a", "200"): 0.0, ("/a", "500"): 0.0, ("/b", "200"): 1.0}

    # scalar CMP vector keeps the vector side's value
    sv = query_instant(mini, "200 <= req", 3000)
    assert [r["value"] for r in sv.collect()] == [300.0]

    # vector CMP vector joins on shared labels, keeps left's value
    vv = query_instant(mini, "req >= sum by (handler) (req)", 3000)
    assert [(r["label_handler"], r["value"]) for r in vv.collect()] == [("/b", 300.0)]


def test_set_ops(spark, mini):
    a = query_instant(mini, 'req and req{handler="/a"}', 3000)
    assert {r["label_code"] for r in a.collect()} == {"200", "500"}
    assert a.count() == 2

    u = query_instant(mini, 'req unless req{handler="/a"}', 3000)
    assert [(r["label_handler"], r["value"]) for r in u.collect()] == [("/b", 300.0)]

    o = query_instant(mini, 'req{code="500"} or req{code="200"}', 3000)
    assert o.count() == 3

    # `or` fallback idiom with a label-less vector() — the keyless path
    fb = query_instant(mini, 'req{handler="/zzz"} or vector(0)', 3000)
    assert [r["value"] for r in fb.collect()] == [0.0]

    # keyless `and`: left survives iff right non-empty
    k = query_instant(mini, "vector(1) and req", 3000)
    assert [r["value"] for r in k.collect()] == [1.0]


def test_irate_idelta_deriv(spark, mini):
    # last two samples of every series are 1s apart with slope v/s = 10/1/100
    for fn, scale in (("irate", 1.0), ("idelta", 1.0), ("deriv", 1.0)):
        out = query_instant(mini, f"{fn}(req[1m])", 3000)
        got = {(r["label_handler"], r["label_code"]): r["value"] for r in out.collect()}
        assert got == {("/a", "200"): 10.0, ("/a", "500"): 1.0, ("/b", "200"): 100.0}, fn


def test_irate_counter_reset(spark):
    rows = [(t * 1000, v, "c") for t, v in enumerate([10.0, 20.0, 4.0])]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    out = query_instant(df, "irate(c[1m])", 2000)
    # reset: last value 4 < prev 20 -> increase is the post-reset value 4
    assert [r["value"] for r in out.collect()] == [4.0]
    ide = query_instant(df, "idelta(c[1m])", 2000)
    assert [r["value"] for r in ide.collect()] == [-16.0]


def test_resets_and_changes(spark):
    rows = [(t * 1000, v, "m") for t, v in enumerate([5.0, 3.0, 3.0, 7.0])]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    assert [r["value"] for r in query_instant(df, "resets(m[1m])", 3000).collect()] == [1.0]
    assert [r["value"] for r in query_instant(df, "changes(m[1m])", 3000).collect()] == [2.0]


def test_quantile_over_time(spark, mini):
    out = query_instant(mini, 'quantile_over_time(0.5, req{handler="/a"}[1m])', 3000)
    got = {r["label_code"]: r["value"] for r in out.collect()}
    assert got == {"200": 15.0, "500": 1.5}


def test_subquery_instant(spark, mini):
    # inner grid (0,3000] at 1s: /b values 100,200,300 -> min 100
    out = query_instant(mini, 'min_over_time(req{handler="/b"}[3s:1s])', 3000)
    assert [r["value"] for r in out.collect()] == [100.0]

    # subquery over a non-selector expression (per-step sum by handler)
    agg = query_instant(mini, "max_over_time(sum by (handler) (req)[3s:1s])", 3000)
    got = {r["label_handler"]: r["value"] for r in agg.collect()}
    assert got == {"/a": 33.0, "/b": 300.0}


def test_subquery_range(spark, mini):
    out = query_range(mini, 'min_over_time(req{handler="/b"}[2s:1s])', 1000, 3000, 1000)
    got = {r["step_ts"]: r["value"] for r in out.collect()}
    assert got == {1000: 0.0, 2000: 100.0, 3000: 200.0}


def test_at_modifier(spark, mini):
    out = query_instant(mini, 'req{handler="/b"} @ 2', at_ms=99_999_000)
    assert [r["value"] for r in out.collect()] == [200.0]
    rng = query_range(mini, 'req{handler="/b"} @ 2', 0, 2000, 1000)
    assert [r["value"] for r in rng.collect()] == [200.0] * 3


def test_absent(spark, mini):
    hit = query_instant(mini, 'absent(req{handler="/zzz"})', 3000)
    assert [tuple(r) for r in hit.collect()] == [(1.0,)]
    miss = query_instant(mini, "absent(req)", 3000)
    assert miss.count() == 0
    # range: series go stale 5 min after the last sample at t=3s
    rng = query_range(mini, "absent(req)", 400_000, 600_000, 100_000)
    assert sorted(r["step_ts"] for r in rng.collect()) == [400_000, 500_000, 600_000]


def test_time_fn(spark, mini):
    out = query_instant(mini, 'req{code="200"} - time()', 3000)
    got = {r["label_handler"]: r["value"] for r in out.collect()}
    assert got == {"/a": 27.0, "/b": 297.0}
    rng = query_range(mini, 'req{handler="/b"} - time()', 1000, 3000, 1000)
    assert {r["step_ts"]: r["value"] for r in rng.collect()} == {
        1000: 99.0, 2000: 198.0, 3000: 297.0}


def test_round_sgn_mod_and_calendar(spark, mini):
    r = query_instant(mini, 'round(req{handler="/a"} / 7)', 3000)
    assert {x["label_code"]: x["value"] for x in r.collect()} == {"200": 4.0, "500": 0.0}
    r20 = query_instant(mini, 'round(req{handler="/a"}, 20)', 3000)
    assert {x["label_code"]: x["value"] for x in r20.collect()} == {"200": 40.0, "500": 0.0}
    sg = query_instant(mini, "sgn(req - 10)", 3000)
    assert {(x["label_handler"], x["label_code"]): x["value"] for x in sg.collect()} == {
        ("/a", "200"): 1.0, ("/a", "500"): -1.0, ("/b", "200"): 1.0}
    md = query_instant(mini, "req % 7", 3000)
    assert {(x["label_handler"], x["label_code"]): x["value"] for x in md.collect()} == {
        ("/a", "200"): 2.0, ("/a", "500"): 3.0, ("/b", "200"): 6.0}
    # 345600s = 1970-01-05, a Monday -> Prometheus day_of_week 1
    cal = query_instant(mini, "day_of_week(vector(345600))", 0)
    assert [r["value"] for r in cal.collect()] == [1.0]


def test_scalarize(spark, mini):
    out = query_instant(mini, "req / scalar(sum(req))", 3000)
    got = {(r["label_handler"], r["label_code"]): round(r["value"], 6)
           for r in out.collect()}
    assert got[("/b", "200")] == round(300 / 333, 6)
    # scalar() of a multi-element vector is NaN
    import math
    nan = query_instant(mini, "req * scalar(req)", 3000)
    assert all(math.isnan(r["value"]) for r in nan.collect())


def test_unary_minus(spark, mini):
    out = query_instant(mini, '-req{handler="/b"}', 3000)
    assert [r["value"] for r in out.collect()] == [-300.0]


def test_label_replace(spark, mini):
    out = query_instant(
        mini,
        'label_replace(req, "env", "prod-$1", "handler", "/(.*)")',
        at_ms=3000,
    )
    got = {(r["label_handler"], r["label_code"]): r["label_env"] for r in out.collect()}
    assert got[("/a", "200")] == "prod-a"
    assert got[("/b", "200")] == "prod-b"


def test_label_replace_no_match_keeps_dst(spark, mini):
    # regex anchored and non-matching → dst (absent here) stays NULL
    out = query_instant(
        mini, 'label_replace(req, "env", "x", "handler", "nope")', at_ms=3000
    )
    assert all(r["label_env"] is None for r in out.collect())


def test_label_join_instant_and_range(spark, mini):
    out = query_instant(
        mini, 'label_join(req, "hc", "-", "handler", "code")', at_ms=3000
    )
    vals = {r["label_hc"] for r in out.collect()}
    assert vals == {"/a-200", "/a-500", "/b-200"}
    # range path: projection applies per step identically
    rng = query_range(
        mini, 'label_join(req, "hc", "-", "handler", "code")',
        start_ms=1000, end_ms=3000, step_ms=1000,
    )
    assert {r["label_hc"] for r in rng.collect()} == {"/a-200", "/a-500", "/b-200"}


def test_label_replace_composes_with_agg(spark, mini):
    out = query_instant(
        mini,
        'sum by (env) (label_replace(req, "env", "$1", "handler", "/(.*)"))',
        at_ms=3000,
    )
    got = {r["label_env"]: r["value"] for r in out.collect()}
    assert got == {"a": 33.0, "b": 300.0}


def test_absent_over_time_instant(spark, mini):
    # data exists in the window → empty; nothing matches → one row of 1.0
    assert query_instant(mini, "absent_over_time(req[5s])", at_ms=3000).count() == 0
    got = query_instant(mini, "absent_over_time(nope[5s])", at_ms=3000).collect()
    assert [r["value"] for r in got] == [1.0]


def test_absent_over_time_range(spark, mini):
    # samples exist at 0..3s; steps beyond 3s + window see nothing
    out = query_range(
        mini, "absent_over_time(req[1s])", start_ms=1000, end_ms=10_000,
        step_ms=1000,
    ).collect()
    absent_steps = sorted(r["step_ts"] for r in out)
    assert all(r["value"] == 1.0 for r in out)
    assert absent_steps == [4000, 5000, 6000, 7000, 8000, 9000, 10000]


def test_arithmetic_precedence_property():
    """The parse TREE must encode PromQL operator precedence: folding the
    AST of a random scalar expression equals Python's evaluation of the
    same string.  (Pure parser property — no Spark session involved.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def fold(n):
        if isinstance(n, Scalar):
            return n.value
        assert isinstance(n, BinOp), type(n)
        a, b = fold(n.left), fold(n.right)
        return {
            "+": lambda: a + b,
            "-": lambda: a - b,
            "*": lambda: a * b,
            "/": lambda: a / b,
        }[n.op]()

    # positive decimal literals keep / and - unambiguous with signs
    lit = st.integers(1, 99).map(lambda i: f"{i}.5")
    expr = st.recursive(
        lit,
        lambda kids: st.tuples(
            kids, st.sampled_from("+-*/"), kids, st.booleans()
        ).map(lambda t: (f"({t[0]} {t[1]} {t[2]})" if t[3]
                         else f"{t[0]} {t[1]} {t[2]}")),
        max_leaves=12,
    )

    @given(expr)
    @settings(max_examples=200, deadline=None)
    def check(s):
        from hypothesis import assume

        try:
            want = eval(s)  # Python shares precedence for + - * / and parens
        except ZeroDivisionError:
            assume(False)  # a subexpression folded to a zero divisor
        got = fold(parse_expr(s))
        assert got == pytest.approx(want, rel=1e-12)

    check()


def test_duration_property_all_units():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    units = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
             "d": 86_400_000, "w": 604_800_000}

    @given(st.integers(1, 10_000), st.sampled_from(sorted(units)))
    @settings(max_examples=100, deadline=None)
    def check(n, u):
        assert parse_duration_ms(f"{n}{u}") == n * units[u]

    check()


def test_parser_fuzz_raises_cleanly():
    """Random token soup must either parse or raise ValueError — never a
    hang, never an internal exception type leaking to the caller."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(
        ["sum", "rate", "(", ")", "[", "]", "{", "}", ",", "+", "*",
         "by", "m", "5m", "1.5", "handler", '"x"', "=", "!=", "offset", "@"]
    )

    @given(st.lists(token, min_size=1, max_size=12).map(" ".join))
    @settings(max_examples=300, deadline=None)
    def check(s):
        try:
            parse_expr(s)
        except ValueError:
            pass

    check()


def test_promql_api_response_shapes(spark):
    # the Prometheus HTTP-API envelope: vector/matrix shapes, __name__
    # mapping, absent labels omitted, Go-style value strings, unix-sec
    # timestamps, deterministic series order, and the sample-limit guard
    import pytest as _pytest

    from tsdb_parquet_spark.promql_api import (
        instant_response,
        query_range_response,
    )

    df = spark.createDataFrame(
        [("up", "api", None, 1.0), ("up", "db", "eu", 0.5),
         ("up", "api", "us", float("inf"))],
        "label_name string, label_job string, label_zone string, value double",
    )
    r = instant_response(df, 1_700_000_000_123)
    assert r["status"] == "success"
    assert r["data"]["resultType"] == "vector"
    by_job = {e["metric"]["job"]: e for e in r["data"]["result"]}
    assert by_job["db"]["metric"] == {
        "__name__": "up", "job": "db", "zone": "eu"}
    assert "zone" not in by_job["api"]["metric"] or \
        by_job["api"]["metric"].get("zone") == "us"
    assert by_job["db"]["value"] == [1_700_000_000.123, "0.5"]
    # integral floats print bare, infinities Prometheus-style
    vals = {e["value"][1] for e in r["data"]["result"]}
    assert "1" in vals and "+Inf" in vals

    with _pytest.raises(ValueError):
        instant_response(df, 0, max_samples=2)

    # end-to-end range over the reference block
    block = spark.read.parquet("data/tsdb_block")
    tmin = block.selectExpr("min(time)").first()[0]
    m = query_range_response(block, "up", tmin, tmin + 120_000, 60_000)
    assert m["data"]["resultType"] == "matrix"
    s = m["data"]["result"][0]
    assert s["metric"]["__name__"] == "up"
    ts = [t for t, _ in s["values"]]
    assert ts == sorted(ts) and len(ts) >= 2


def test_promql_api_histogram_envelope(spark):
    """Histogram-typed values in the /api/v1/query envelope (r15 —
    verdict r14 #8): a native-histogram instant vector emits the
    Prometheus 3.x ``histogram`` member ``[ts, {count, sum, buckets}]``
    with ``buckets`` rows ``[boundary_rule, "lower", "upper", "count"]``
    (rule 0 = open-left positive bucket, 3 = closed zero bucket) —
    the documented shape, values as strings."""
    from tsdb_parquet_spark.promql_api import (
        instant_response,
        query_instant_response,
        query_range_response,
    )

    rows = [
        (
            1000, "m", "i1", 20, 30.0, 5, 0,
            [{"k": 1, "c": 10}, {"k": 2, "c": 5}],
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "time long, label_name string, label_instance string, "
        "count long, sum double, zero_count long, schema int, "
        "buckets array<struct<k: int, c: bigint>>",
    )
    r = query_instant_response(df, "m", 1000)
    assert r["data"]["resultType"] == "vector"
    e = r["data"]["result"][0]
    assert e["metric"] == {"__name__": "m", "instance": "i1"}
    assert "value" not in e
    ts, h = e["histogram"]
    assert ts == 1.0
    assert h["count"] == "20" and h["sum"] == "30"
    # zero bucket first (closed), then (1,2] and (2,4] open-left
    assert h["buckets"] == [
        [3, "0", "0", "5"],
        [0, "1", "2", "10"],
        [0, "2", "4", "5"],
    ]
    # rate() output stays histogram-typed through the envelope
    df2 = df.unionByName(
        spark.createDataFrame(
            [(61000, "m", "i1", 30, 50.0, 7,
              0, [{"k": 1, "c": 16}, {"k": 2, "c": 7}])],
            df.schema,
        )
    )
    r2 = query_instant_response(df2, "rate(m[2m])", 61000)
    h2 = r2["data"]["result"][0]["histogram"][1]
    assert float(h2["count"]) == pytest.approx(10 / 60)
    # matrix: histograms member, time-ordered
    m = query_range_response(df2, "m", 1000, 61000, 60000)
    s = m["data"]["result"][0]
    assert "values" not in s and len(s["histograms"]) == 2
    tss = [t for t, _ in s["histograms"]]
    assert tss == sorted(tss)
    assert s["histograms"][0][1]["count"] == "20"
    # guard still applies to histogram vectors
    import pytest as _pytest

    with _pytest.raises(ValueError):
        instant_response(
            df2.selectExpr(
                "label_name", "label_instance", "count", "sum",
                "zero_count", "schema", "buckets"
            ),
            0, max_samples=1,
        )


def test_promql_api_discovery_endpoints(spark):
    # /api/v1/series, /labels, /label/<name>/values over the reference
    # block: __name__ mapping in selectors and outputs, schema-only
    # labels listing, sorted distinct values
    from tsdb_parquet_spark.promql_api import (
        label_values_response,
        labels_response,
        series_response,
    )

    block = spark.read.parquet("data/tsdb_block")
    s = series_response(block, '{__name__="up"}')
    assert s["data"] == [{"__name__": "up", "instance": "localhost:9090",
                          "job": "prometheus"}]
    names = labels_response(block)["data"]
    assert "__name__" in names and "job" in names and "label_name" not in names
    vals = label_values_response(block, "job")["data"]
    assert vals == ["prometheus"]
    metrics = label_values_response(block, "__name__")["data"]
    assert "up" in metrics and metrics == sorted(metrics)
    assert label_values_response(block, "nope")["data"] == []


def test_histogram_fraction_interpolation(spark):
    from tsdb_parquet_spark.promql import histogram_fraction

    # one instant, buckets le=0.1(30) 0.5(80) +Inf(100)
    rows = [
        ("h", 1000, "0.1", 30.0),
        ("h", 1000, "0.5", 80.0),
        ("h", 1000, "+Inf", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "label_handler string, time long, label_le string, value double"
    )

    def frac(u):
        return histogram_fraction(df, u, labels=["label_handler"]).first()[
            "fraction"]

    assert frac(0.1) == pytest.approx(0.30)         # exact bucket edge
    assert frac(0.3) == pytest.approx((30 + 50 * 0.5) / 100)  # midpoint
    assert frac(0.5) == pytest.approx(0.80)
    assert frac(1.0) == pytest.approx(0.80)         # beyond last finite le
    assert frac(0.05) == pytest.approx(0.15)        # first bucket, lower bound 0


def test_timestamp_function(spark, mini):
    # plain selector: each series' own latest-sample time (t=3s at eval
    # 3.5s); derived vector: samples are stamped at the eval instant
    own = query_instant(mini, "timestamp(req)", at_ms=3500)
    assert {r["value"] for r in own.collect()} == {3.0}
    off = query_instant(mini, "timestamp(req offset 1s)", at_ms=3500)
    assert {r["value"] for r in off.collect()} == {2.0}
    derived = query_instant(mini, "timestamp(sum by (handler) (req))", at_ms=3500)
    assert {r["value"] for r in derived.collect()} == {3.5}
    # range form: per-step sample timestamps
    rng = query_range(mini, "timestamp(req)", 1000, 3000, 1000)
    got = {(r["label_handler"], r["label_code"], r["step_ts"]): r["value"]
           for r in rng.collect()}
    assert got[("/a", "200", 2000)] == 2.0 and got[("/b", "200", 3000)] == 3.0


def test_predict_linear_instant_and_range(spark, mini):
    # /a,200 rises 10/s; /a,500 1/s; /b,200 100/s — perfectly linear, so
    # the extrapolation is exact: v(at) + slope * horizon
    n = parse_expr("predict_linear(req[1m], 10)")
    assert isinstance(n, RangeFn) and n.fn == "predict_linear"
    assert n.param == (10.0,)
    out = query_instant(mini, "predict_linear(req[1m], 10)", at_ms=3000)
    got = {(r["label_handler"], r["label_code"]): round(r["value"], 6)
           for r in out.collect()}
    assert got == {("/a", "200"): 130.0, ("/a", "500"): 13.0,
                   ("/b", "200"): 1300.0}
    # negative horizon looks backward
    back = query_instant(mini, "predict_linear(req[1m], -1)", at_ms=3000)
    gb = {(r["label_handler"], r["label_code"]): round(r["value"], 6)
          for r in back.collect()}
    assert gb[("/a", "200")] == 20.0
    # range form: per-step regression over the trailing window — at
    # step 2000 the window holds t=0..2000, still the same line
    rng = query_range(mini, "predict_linear(req[1m], 10)", 1000, 3000, 1000)
    gr = {(r["label_handler"], r["label_code"], r["step_ts"]):
          round(r["value"], 6) for r in rng.collect()}
    assert gr[("/a", "200", 2000)] == 120.0
    assert gr[("/b", "200", 3000)] == 1300.0


def test_predict_linear_single_sample_drops(spark, mini):
    # a 500ms window at t=3000 sees exactly one sample — undefined slope
    out = query_instant(mini, "predict_linear(req[500ms], 10)", at_ms=3000)
    assert out.count() == 0


def test_holt_winters_instant_matches_reference(spark, mini):
    # linear series: double exponential smoothing tracks exactly
    out = query_instant(mini, "holt_winters(req[1m], 0.5, 0.3)", at_ms=3000)
    got = {(r["label_handler"], r["label_code"]): round(r["value"], 9)
           for r in out.collect()}
    assert got == {("/a", "200"): 30.0, ("/a", "500"): 3.0,
                   ("/b", "200"): 300.0}


def test_holt_winters_wiggly_matches_python_recurrence(spark):
    vals = [5.0, 9.0, 2.0, 14.0, 3.0, 8.0, 11.0]
    rows = [(i * 1000, v, "sig", "/x") for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "time long, value double, label_name string, "
        "label_handler string")
    sf, tf = 0.4, 0.2

    def ref(v):
        s, b = v[0], v[1] - v[0]
        for x in v[1:]:
            s_prev = s
            s = sf * x + (1 - sf) * (s + b)
            b = tf * (s - s_prev) + (1 - tf) * b
        return s

    out = query_instant(df, "holt_winters(sig[1m], 0.4, 0.2)", at_ms=6000)
    assert out.first()["value"] == pytest.approx(ref(vals), abs=1e-12)
    # trailing-window range form reproduces the per-window recurrence
    rng = query_range(df, "holt_winters(sig[3s], 0.4, 0.2)", 3000, 6000, 1000)
    got = {r["step_ts"]: r["value"] for r in rng.collect()}
    # window (0,3]s -> samples 1..3 of the list (t in (0,3000])
    assert got[3000] == pytest.approx(ref(vals[1:4]), abs=1e-12)
    assert got[6000] == pytest.approx(ref(vals[4:7]), abs=1e-12)


def test_holt_winters_validation_and_min_samples(spark, mini):
    with pytest.raises(ValueError):
        parse_expr("holt_winters(req[1m], 1.5, 0.3)")
    with pytest.raises(ValueError):
        parse_expr("holt_winters(req[1m], 0.5, 0)")
    # <2 samples in window: series drops
    out = query_instant(mini, "holt_winters(req[500ms], 0.5, 0.3)",
                        at_ms=3000)
    assert out.count() == 0


def test_predict_linear_subquery_form(spark, mini):
    # inner grid of sum-by-handler at 1s steps, regression over the grid
    out = query_instant(
        mini, "predict_linear(sum by (handler) (req)[3s:1s], 1)",
        at_ms=3000)
    got = {r["label_handler"]: round(r["value"], 6) for r in out.collect()}
    # /a totals at 1,2,3s: 11,22,33 -> slope 11/s, predict at +1s = 44
    assert got["/a"] == 44.0 and got["/b"] == 400.0


def test_parse_power_precedence():
    # right-assoc: 2^3^2 = 2^(3^2) = 512; unary minus binds looser: -2^2 = -4
    n = parse_expr("m * 2^3^2")
    assert isinstance(n, BinOp) and n.op == "*"
    assert isinstance(n.right, Scalar) and n.right.value == 512.0
    n = parse_expr("m + -2^2")
    assert isinstance(n.right, Scalar) and n.right.value == -4.0
    # scalar folding through functions and pi()
    n = parse_expr("m * sin(pi()/2)")
    assert isinstance(n.right, Scalar) and n.right.value == 1.0


def test_trig_and_power_eval(spark, mini):
    import math

    out = query_instant(mini, 'cos(req{handler="/a"} * 0)', at_ms=3000)
    vals = {r["value"] for r in out.collect()}
    assert vals == {1.0}
    out = query_instant(mini, 'req{handler="/a",code="200"} ^ 2', at_ms=3000)
    assert out.collect()[0]["value"] == 900.0
    # deg/rad roundtrip
    out = query_instant(mini, 'deg(rad(req{code="500"}))', at_ms=3000)
    assert round(out.collect()[0]["value"], 9) == 3.0
    # vector atan2 scalar
    out = query_instant(mini, 'req{handler="/b"} atan2 0', at_ms=3000)
    assert out.collect()[0]["value"] == math.atan2(300.0, 0.0)


def test_atan2_vector_vector(spark, mini):
    import math

    # y atan2 x between the two /a series, matching on shared labels minus code
    out = query_instant(
        mini,
        'req{code="200"} atan2 ignoring(code) req{code="500"}',
        at_ms=3000,
    )
    got = {r["label_handler"]: r["value"] for r in out.collect()}
    assert got["/a"] == math.atan2(30.0, 3.0)


def test_vector_matching_absent_labels(spark):
    # Prometheus matches an absent label with an absent label (both "");
    # on the wide layout absent = NULL, so matching must be null-safe.
    rows = [
        (1000, 10.0, "m", "/a", None),
        (1000, 3.0, "n", "/a", None),
        (1000, 7.0, "m", "/b", "x"),
        (1000, 2.0, "n", "/b", "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "time long, value double, label_name string, label_handler string, "
        "label_extra string",
    )
    out = query_instant(df, "m - ignoring(name) n", at_ms=1000)
    got = {r["label_handler"]: r["value"] for r in out.collect()}
    assert got == {"/a": 7.0, "/b": 5.0}
    # set ops are null-safe too
    out = query_instant(df, "m and ignoring(name) n", at_ms=1000)
    assert out.count() == 2
    out = query_instant(df, "m unless ignoring(name) n", at_ms=1000)
    assert out.count() == 0


def test_mad_over_time(spark, mini):
    # /a code=200 window values 0,10,20,30: median 15, |dev| 15,5,5,15,
    # MAD = 10; /a code=500 scaled by 10: MAD = 1
    out = query_instant(mini, 'mad_over_time(req{handler="/a"}[1m])',
                        at_ms=3000)
    got = {r["label_code"]: r["value"] for r in out.collect()}
    assert got == {"200": 10.0, "500": 1.0}


def test_ts_of_extremes_over_time(spark, mini):
    # /a 200: values 0,10,20,30 at t=0..3s -> max at 3s, min at 0s
    out = query_instant(mini, 'ts_of_max_over_time(req{code="200"}[1m])',
                        at_ms=3000)
    got = {r["label_handler"]: r["value"] for r in out.collect()}
    assert got == {"/a": 3.0, "/b": 3.0}
    out = query_instant(mini, 'ts_of_min_over_time(req{code="200"}[1m])',
                        at_ms=3000)
    got = {r["label_handler"]: r["value"] for r in out.collect()}
    assert got == {"/a": 0.0, "/b": 0.0}
    out = query_instant(mini, 'ts_of_last_over_time(req[1m])', at_ms=2500)
    assert {r["value"] for r in out.collect()} == {2.0}


def test_ts_of_max_tie_keeps_latest(spark):
    rows = [(0, 5.0, "m"), (1000, 5.0, "m"), (2000, 1.0, "m")]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    out = query_instant(df, "ts_of_max_over_time(m[1m])", at_ms=2000)
    assert out.collect()[0]["value"] == 1.0  # the LATER of the two maxima
    out = query_instant(df, "ts_of_min_over_time(m[500ms])", at_ms=1000)
    assert out.collect()[0]["value"] == 1.0


def test_double_exponential_smoothing_alias(spark, mini):
    a = query_instant(mini, "holt_winters(req[1m], 0.5, 0.25)", at_ms=3000)
    b = query_instant(
        mini, "double_exponential_smoothing(req[1m], 0.5, 0.25)", at_ms=3000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_at_start_end_modifiers(spark, mini):
    # instant: @ start() == @ end() == the eval instant
    a = query_instant(mini, "req @ start()", at_ms=3000).collect()
    b = query_instant(mini, "req", at_ms=3000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # range: @ end() pins every step to the range end's instant vector
    out = query_range(mini, "req @ end()", start_ms=1000, end_ms=3000,
                      step_ms=1000)
    rows = out.filter("label_handler = '/b' and label_code = '200'").collect()
    assert {r["step_ts"] for r in rows} == {1000, 2000, 3000}
    assert {r["value"] for r in rows} == {300.0}
    # range: @ start() pins to the range start
    out = query_range(mini, "req @ start()", start_ms=1000, end_ms=3000,
                      step_ms=1000)
    rows = out.filter("label_handler = '/b' and label_code = '200'").collect()
    assert {r["value"] for r in rows} == {100.0}


def test_sort_by_label_and_day_of_year(spark, mini):
    out = query_instant(mini, 'sort_by_label(req, "handler")', at_ms=3000)
    handlers = [r["label_handler"] for r in out.collect()]
    assert handlers == sorted(handlers)
    out = query_instant(mini, 'sort_by_label_desc(req, "code")', at_ms=3000)
    codes = [r["label_code"] for r in out.collect()]
    assert codes == sorted(codes, reverse=True)
    with pytest.raises(ValueError):
        parse_expr("sort_by_label(req)")
    # day_of_year over epoch-seconds values: 0 -> Jan 1 -> 1.0
    out = query_instant(mini, "day_of_year(req * 0)", at_ms=3000)
    assert {r["value"] for r in out.collect()} == {1.0}


def test_constant_fold_ieee_semantics():
    """Advice r11: out-of-domain literals must FOLD to IEEE values
    (NaN/±Inf) exactly as Prometheus's Go float64 engine evaluates
    them, never crash the parser with ValueError/OverflowError."""
    import math

    def fold(expr):
        node = parse_expr(expr)
        assert isinstance(node, Scalar), f"{expr} did not fold: {node}"
        return node.value

    # division by zero: ±Inf by the sign product, NaN only for 0/0
    assert fold("1 / 0") == math.inf
    assert fold("-1 / 0") == -math.inf
    assert math.isnan(fold("0 / 0"))
    # out-of-domain unary → NaN, defined limits → their IEEE values
    assert math.isnan(fold("sqrt(0 - 1)"))
    assert math.isnan(fold("ln(0 - 1)"))
    assert math.isnan(fold("asin(2)"))
    assert math.isnan(fold("acosh(0.5)"))
    assert fold("ln(0)") == -math.inf
    assert fold("log10(0)") == -math.inf
    assert fold("atanh(1)") == math.inf
    assert fold("atanh(0 - 1)") == -math.inf
    # pow: negative base ^ non-integer exponent is NaN (IEEE pow),
    # overflow saturates to ±Inf with the right sign
    assert math.isnan(fold("(0 - 2) ^ 0.5"))
    assert fold("10 ^ 400") == math.inf
    assert fold("(0 - 10) ^ 401") == -math.inf
    # exp/cosh/sinh overflow → ±Inf; fmod stays NaN at 0 divisor
    assert fold("exp(1000)") == math.inf
    assert fold("cosh(0 - 1000)") == math.inf
    assert fold("sinh(0 - 1000)") == -math.inf
    assert math.isnan(fold("5 % 0"))
    # ceil/floor pass non-finite through instead of raising
    assert fold("ceil(1 / 0)") == math.inf
    assert math.isnan(fold("floor(0 / 0)"))
    # sanity: in-domain folds unchanged
    assert fold("sqrt(9)") == 3.0
    assert fold("2 ^ 10") == 1024.0


def test_limitk_and_limit_ratio_semantics(spark):
    """Deterministic samplers: limitk respects by-groups and the
    global form; limit_ratio(r) and limit_ratio(r-1) partition the
    input EXACTLY (the Prometheus complement contract, deterministic
    here by md5 identity)."""
    import __spark_entry__ as em
    from tsdb_parquet_spark.tables import load_table

    tsdb = load_table(spark, "/root/testdata/sf0.001", "tsdb")
    by = query_instant(
        tsdb, "limitk by (label_code) (3, prometheus_http_requests_total)",
        em.T1,
    )
    rows = by.collect()
    assert len(rows) == 12
    from collections import Counter
    assert set(Counter(r["label_code"] for r in rows).values()) == {3}

    glob = query_instant(
        tsdb, "limitk(5, prometheus_http_requests_total)", em.T1
    )
    assert glob.count() == 5

    keep = query_instant(
        tsdb, "limit_ratio(0.35, prometheus_http_requests_total)", em.T1
    )
    comp = query_instant(
        tsdb, "limit_ratio(-0.65, prometheus_http_requests_total)", em.T1
    )
    key = lambda r: (r["label_code"], r["label_handler"])
    ks, cs = {key(r) for r in keep.collect()}, {key(r) for r in comp.collect()}
    assert not (ks & cs)
    total = query_instant(
        tsdb, "prometheus_http_requests_total", em.T1
    ).count()
    assert len(ks) + len(cs) == total == 280
    # determinism: a second evaluation returns the identical sample
    keep2 = {key(r) for r in query_instant(
        tsdb, "limit_ratio(0.35, prometheus_http_requests_total)", em.T1
    ).collect()}
    assert keep2 == ks


def test_limitk_parse_errors():
    with pytest.raises(ValueError):
        parse_expr("limit_ratio(1.5, up)")
    with pytest.raises(ValueError):
        parse_expr("limit_ratio by (label_code) (0.5, up)")
    with pytest.raises(ValueError):
        parse_expr("limitk without (label_code) (3, up)")


def test_info_enrichment_and_default(spark):
    """info(): data labels donated via the identifying-label join,
    series precedence on conflicts, default *_info selector degrades
    to a no-op enrichment on a fixture without info metrics."""
    from tsdb_parquet_spark.tables import load_table

    import __spark_entry__ as em

    tsdb = load_table(spark, "/root/testdata/sf0.001", "tsdb")
    out = query_instant(
        tsdb,
        'info(go_goroutines, {name="prometheus_http_requests_total",'
        'handler="/metrics",code="200"})',
        em.T1,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["label_name"] == "go_goroutines"  # name NOT overwritten
    assert r["label_handler"] == "/metrics" and r["label_code"] == "200"
    # series precedence: the vector's own non-null label survives —
    # requests_total enriched with itself keeps its per-series handler
    own = query_instant(
        tsdb,
        'info(prometheus_http_requests_total, '
        '{name="prometheus_http_requests_total",'
        'handler="/metrics",code="200"})',
        em.T1,
    )
    handlers = {x["label_handler"] for x in own.collect()}
    assert len(handlers) > 1  # not collapsed to '/metrics'
    # default selector: no *_info metric in the fixture -> same rows
    base = query_instant(tsdb, "go_goroutines", em.T1).count()
    assert query_instant(tsdb, "info(go_goroutines)", em.T1).count() == base
    # conflict enforcement (advice r12, Prometheus parity r14): a broad
    # info selector whose matched series DISAGREE on a data label's
    # value (here: handler varies across the matched series) raises
    # like Prometheus, instead of silently fanning out result rows
    with pytest.raises(Exception, match="multiple info series"):
        query_instant(
            tsdb,
            'info(go_goroutines, '
            '{name="prometheus_http_requests_total",code="200"})',
            em.T1,
        ).collect()


def test_info_disjoint_donors_merge(spark):
    """Prometheus parity (advice r13): TWO info series sharing an
    identifying-label set but donating DISJOINT data labels merge
    instead of erroring — only a conflicting value for the SAME data
    label raises."""
    rows = [
        # (time, value, name, instance, job, version, env)
        (1000, 1.0, "build_info", "a:1", "j", "9.9", None),
        (1000, 1.0, "target_info", "a:1", "j", None, "prod"),
        (1000, 5.0, "up", "a:1", "j", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "time long, value double, label_name string, "
        "label_instance string, label_job string, "
        "label_version string, label_env string",
    )
    out = query_instant(df, "info(up)", 1000).collect()
    assert len(out) == 1
    assert out[0]["label_version"] == "9.9"
    assert out[0]["label_env"] == "prod"
    # same data label, different values -> Prometheus conflict error
    rows2 = rows + [(1000, 1.0, "other_info", "a:1", "j", "8.8", None)]
    df2 = spark.createDataFrame(rows2, df.schema)
    with pytest.raises(Exception, match="conflicting data-label"):
        query_instant(df2, "info(up)", 1000).collect()


def test_info_default_selector_on_info_fixture(spark):
    """The Prometheus default selector {name=~".+_info"} finds
    target_info on the tsdb_info fixture and donates version/env onto
    each instance's gauge (r13, q174b)."""
    from tsdb_parquet_spark.tables import load_table

    import __spark_entry__ as em

    ti = load_table(spark, "/root/testdata/sf0.001", "tsdb_info")
    out = {
        r["label_instance"]: (r["label_version"], r["label_env"])
        for r in query_instant(ti, "info(node_cpu_usage)", em.T1).collect()
    }
    assert out == {
        "host1:9100": ("1.2.3", "prod"),
        "host2:9100": ("1.2.4", "staging"),
        "host3:9100": ("2.0.0", "prod"),
    }


def test_histogram_fraction_classic_via_parser(spark):
    """histogram_fraction(lo, hi, m) over classic le buckets through the
    parser: hand-checkable cumulative buckets at one instant.  Series
    (le: cum count): 0.1: 10, 0.2: 30, +Inf: 40.  fraction(0, 0.2) =
    30/40; fraction(0.1, 0.2) = (30-10)/40; fraction(0, 0.15)
    interpolates inside (0.1, 0.2]: (10 + 20*0.5)/40 = 0.5."""
    rows = [
        (1000, 10.0, "lat_bucket", "/a", "0.1"),
        (1000, 30.0, "lat_bucket", "/a", "0.2"),
        (1000, 40.0, "lat_bucket", "/a", "+Inf"),
    ]
    df = spark.createDataFrame(
        rows,
        "time long, value double, label_name string, label_handler string, "
        "label_le string",
    )

    def frac(expr):
        out = query_instant(df, expr, at_ms=1000).collect()
        assert len(out) == 1
        return out[0]["value"]

    assert frac("histogram_fraction(0, 0.2, lat_bucket)") == 0.75
    assert frac("histogram_fraction(0.1, 0.2, lat_bucket)") == 0.5
    assert frac("histogram_fraction(0, 0.15, lat_bucket)") == 0.5


def test_histogram_fraction_parse_errors():
    # lo < 0 stays a documented positive-bucket-model restriction
    with pytest.raises(ValueError):
        parse_expr("histogram_fraction(-1, 0.5, m)")
    # hi <= lo is ACCEPTED per upstream Prometheus (evaluates to 0 per
    # series — advice r14); it must parse cleanly
    parse_expr("histogram_fraction(0.5, 0.5, m)")


def test_histogram_fraction_native_via_parser(spark):
    """Native path: instant histogram selector → sparse walk.  One
    series, schema 0: zero_count 5, bucket k=1 (1,2]: 10, k=2 (2,4]:
    5, count 20.  fraction(0, 3) = (5 + 10 + 5*0.5)/20 = 0.875;
    fraction(2, 3) = 0.875 - fraction(0,2) = 0.875 - 0.75."""
    rows = [
        (
            1000, "m", "i1", 20, 5, 30.0, 0,
            [{"k": 1, "c": 10}, {"k": 2, "c": 5}],
        )
    ]
    df = spark.createDataFrame(
        rows,
        "time long, label_name string, label_instance string, count long, "
        "zero_count long, sum double, schema int, "
        "buckets array<struct<k:int,c:long>>",
    )
    out = query_instant(df, 'histogram_fraction(0, 3, {name="m"})', 1000)
    assert [r["value"] for r in out.collect()] == [0.875]
    out2 = query_instant(df, 'histogram_fraction(2, 3, {name="m"})', 1000)
    assert [round(r["value"], 9) for r in out2.collect()] == [0.125]
