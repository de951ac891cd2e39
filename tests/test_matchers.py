"""Matcher-compiler semantics: the one subtle part of the reference
(SURVEY.md §2.1 R10-R12) — SQL 3VL vs Prometheus null handling, and
explicit anchoring.  Reference: /root/reference/hello.go:302-318."""

from __future__ import annotations

from tsdb_parquet_spark.matchers import Matcher, apply_matchers


def names(df, q):
    return sorted(r["time"] for r in df.collect()) if q is None else None


def times(df):
    return sorted(r["time"] for r in df.collect())


def test_eq_basic(tsdb_mini):
    out = apply_matchers(tsdb_mini, [Matcher("=", "quantile", "0.5")])
    assert times(out) == [2000]


def test_eq_empty_prometheus_matches_absent(tsdb_mini):
    # Prometheus: label="" matches series WITHOUT the label (NULL or "").
    out = apply_matchers(
        tsdb_mini, [Matcher("=", "quantile", "")], null_semantics="prometheus"
    )
    assert times(out) == [1000, 4000, 5000]


def test_eq_empty_sql_3vl(tsdb_mini):
    # SQL 3VL: NULL = '' is NULL -> dropped; only the explicit "" row stays.
    out = apply_matchers(tsdb_mini, [Matcher("=", "quantile", "")], null_semantics="sql")
    assert times(out) == [5000]


def test_neq_sql_drops_nulls(tsdb_mini):
    # Reference behavior (hello.go:308-309 under 3VL): NULL quantile dropped.
    out = apply_matchers(tsdb_mini, [Matcher("!=", "quantile", "0.5")], null_semantics="sql")
    assert times(out) == [3000, 5000]


def test_neq_prometheus_keeps_nulls(tsdb_mini):
    out = apply_matchers(
        tsdb_mini, [Matcher("!=", "quantile", "0.5")], null_semantics="prometheus"
    )
    assert times(out) == [1000, 3000, 4000, 5000]


def test_regex_anchored_vs_unanchored(tsdb_mini):
    # anchored: 'go_.*' must match the WHOLE value
    anchored = apply_matchers(tsdb_mini, [Matcher("=~", "name", "go_.*")], anchored=True)
    assert times(anchored) == [4000]
    # unanchored (reference's literal behavior, hello.go:310-311):
    # 'o_' matches substrings
    sub = apply_matchers(tsdb_mini, [Matcher("=~", "name", "o_")], anchored=False)
    assert times(sub) == [4000]
    none = apply_matchers(tsdb_mini, [Matcher("=~", "name", "o_")], anchored=True)
    assert times(none) == []


def test_regex_prometheus_null_as_empty(tsdb_mini):
    # Prometheus: absent label == ""; =~'.*' matches everything, even NULL.
    out = apply_matchers(
        tsdb_mini, [Matcher("=~", "quantile", ".*")], null_semantics="prometheus"
    )
    assert out.count() == 5
    # SQL 3VL: NULL rlike anything is NULL -> dropped.
    out_sql = apply_matchers(
        tsdb_mini, [Matcher("=~", "quantile", ".*")], null_semantics="sql"
    )
    assert times(out_sql) == [2000, 3000, 5000]


def test_neg_regex_both_semantics(tsdb_mini):
    sql = apply_matchers(
        tsdb_mini, [Matcher("!~", "quantile", "0\\..*")], null_semantics="sql"
    )
    assert times(sql) == [5000]
    prom = apply_matchers(
        tsdb_mini, [Matcher("!~", "quantile", "0\\..*")], null_semantics="prometheus"
    )
    assert times(prom) == [1000, 4000, 5000]


def test_conjunction(tsdb_mini):
    out = apply_matchers(
        tsdb_mini,
        [Matcher("=", "name", "latency"), Matcher("=", "instance", "a:9090")],
    )
    assert times(out) == [2000, 3000]


def test_eq_neq_complementarity_property(spark):
    # SURVEY §5.2 item 5: on a non-null domain, eq and neq partition the
    # rows exactly (3VL and prometheus agree when no NULLs exist)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    values = ["a", "b", "c", ""]

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.sampled_from(values), min_size=1, max_size=12),
           st.sampled_from(values))
    def prop(labels, target):
        df = spark.createDataFrame(
            [(i, 0.0, v) for i, v in enumerate(labels)],
            "time long, value double, label_q string",
        )
        def n(op, sem):
            return apply_matchers(
                df, [Matcher(op, "q", target)],
                label_col=lambda name: df["label_q"],
                null_semantics=sem,
            ).count()
        assert n("=", "sql") + n("!=", "sql") == len(labels)
        assert n("=", "prometheus") + n("!=", "prometheus") == len(labels)
        assert n("=", "sql") == sum(1 for v in labels if v == target)

    prop()
