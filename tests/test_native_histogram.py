"""Native (sparse exponential) histograms: exact bucketing, schema
shape, and quantile semantics against a pure-Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.native_histogram import (
    native_histogram_from_values,
    native_histogram_quantile,
)


def _py_quantile(values: list[int], q: float) -> float:
    """Pure-Python reference: schema-0 buckets (2^(k-1), 2^k], zero
    bucket for v < 1, cumulative walk, within-bucket linear
    interpolation — the module's documented model."""
    zero = sum(1 for v in values if v < 1)
    buckets: dict[int, int] = {}
    for v in values:
        if v >= 1:
            k = 0 if v == 1 else (v - 1).bit_length()
            buckets[k] = buckets.get(k, 0) + 1
    total = len(values)
    rank = q * total
    if rank <= zero:
        return 0.0
    cum = zero
    for k in sorted(buckets):
        c = buckets[k]
        cum += c
        if cum >= rank:
            lower, upper = 2.0 ** (k - 1), 2.0 ** k
            frac = (rank - (cum - c)) / c
            return round(lower + (upper - lower) * frac, 6)
    raise AssertionError("rank beyond total")


def test_exact_bucket_index_at_boundaries(spark):
    """The bit-length identity must place every power-of-two boundary
    exactly: v in (2^(k-1), 2^k] -> bucket k — the ulp-proof property
    a floating log2 does not have."""
    vals = [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 1023, 1024, 1025]
    df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
        "g", F.lit("a")
    )
    hist = native_histogram_from_values(df, "v", ["g"]).collect()[0]
    got = {b["k"]: b["c"] for b in hist["buckets"]}
    want: dict[int, int] = {}
    for v in vals:
        k = 0 if v == 1 else (v - 1).bit_length()
        want[k] = want.get(k, 0) + 1
    assert got == want
    assert hist["count"] == len(vals) and hist["zero_count"] == 0
    assert hist["schema"] == 0
    # k-sorted sparse array
    ks = [b["k"] for b in hist["buckets"]]
    assert ks == sorted(ks)


@pytest.mark.parametrize("q", [0.1, 0.5, 0.9, 0.99])
def test_quantile_matches_python_reference(spark, q):
    values = [(i * 37) % 500 for i in range(400)]  # incl. zeros
    df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
        "g", F.lit("a")
    )
    hist = native_histogram_from_values(df, "v", ["g"])
    got = native_histogram_quantile(hist, q, ["g"]).collect()
    assert len(got) == 1
    assert math.isclose(got[0]["value"], _py_quantile(values, q),
                        rel_tol=0, abs_tol=0)


def test_quantile_zero_bucket_hit(spark):
    """A rank landing inside the zero bucket returns 0.0 (all
    non-positive observations sit at the zero point)."""
    values = [0] * 90 + [4] * 10
    df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
        "g", F.lit("a")
    )
    hist = native_histogram_from_values(df, "v", ["g"])
    got = native_histogram_quantile(hist, 0.5, ["g"]).collect()
    assert got[0]["value"] == 0.0
    # and a rank past the zero bucket interpolates in (2,4]
    got9 = native_histogram_quantile(hist, 0.95, ["g"]).collect()[0]["value"]
    assert 2.0 < got9 <= 4.0
    assert got9 == _py_quantile(values, 0.95)


def test_multi_group_independent_walks(spark):
    rows = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [100] * 4]
    df = spark.createDataFrame(rows, "g string, v long")
    hist = native_histogram_from_values(df, "v", ["g"])
    got = {r["g"]: r["value"]
           for r in native_histogram_quantile(hist, 0.5, ["g"]).collect()}
    assert got["a"] == _py_quantile([1, 2, 3, 4], 0.5)
    assert got["b"] == _py_quantile([100] * 4, 0.5)


def test_fraction_matches_python_reference(spark):
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_fraction,
    )

    values = [(i * 37) % 500 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
        "g", F.lit("a")
    )
    hist = native_histogram_from_values(df, "v", ["g"])
    for upper in (0.7, 1.0, 3.0, 100.0, 300.0, 1024.0):
        got = native_histogram_fraction(hist, upper, ["g"]).collect()[0][
            "fraction"
        ]
        # pure-Python reference on the same bucket model
        zero = sum(1 for v in values if v < 1)
        import math
        m, e = math.frexp(upper)
        k = e - 1 if m == 0.5 else e
        lo, hi = 2.0 ** (k - 1), 2.0 ** k
        acc = float(zero)
        buckets: dict[int, int] = {}
        for v in values:
            if v >= 1:
                kk = 0 if v == 1 else (v - 1).bit_length()
                buckets[kk] = buckets.get(kk, 0) + 1
        for kk, c in buckets.items():
            if kk < k:
                acc += c
            elif kk == k:
                acc += c * ((upper - lo) / (hi - lo))
        # HALF_UP like Spark/DuckDB round (Python round() is
        # half-even: 0.2034375 -> .203437 vs the engines' .203438)
        want = math.floor(acc / len(values) * 1e6 + 0.5) / 1e6
        assert got == want, (upper, got, want)


def test_zero_only_series_survives(spark):
    """A label set whose observations are ALL < 1 must still emit a
    histogram row (count == zero_count, empty buckets) — it used to
    vanish because hist rows were derived only from positive obs."""
    rows = [("a", 0), ("a", 0), ("a", -3), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r
        for r in native_histogram_from_values(df, "v", ["g"]).collect()
    }
    assert set(got) == {"a", "b"}
    a = got["a"]
    assert a["count"] == 3 and a["zero_count"] == 3
    assert a["buckets"] == [] and a["sum"] == 0
    # and the quantile walk treats it as all-at-zero
    hist = native_histogram_from_values(df, "v", ["g"])
    q = {r["g"]: r["value"]
         for r in native_histogram_quantile(hist, 0.5, ["g"]).collect()}
    assert q["a"] == 0.0


def _py_float_k(v: float) -> int:
    """Pure-Python replay of bucket_index_exact_float: ceil(log2(v))
    with the one-step exact-pow correction."""
    k0 = math.ceil(math.log2(v))
    if 2.0 ** (k0 - 1) >= v:
        return k0 - 1
    if 2.0 ** k0 < v:
        return k0 + 1
    return k0


def test_float_bucket_index_exact_at_boundaries(spark):
    """Float bucketing must be EXACT at every power-of-two boundary
    (v = 2^j -> bucket j) and across it (nextafter up -> j+1), and
    values in (0,1) take negative bucket indices."""
    import numpy as np

    from tsdb_parquet_spark.native_histogram import bucket_index_exact_float

    vals = []
    for j in range(-8, 12):
        b = 2.0 ** j
        vals += [b, float(np.nextafter(b, np.inf)),
                 float(np.nextafter(b, 0.0))]
    vals += [0.3, 0.75, 1.5, 3.7, 1000.001, 1e-30, 1e30]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r["k"] for r in
           df.select(bucket_index_exact_float("v").alias("k")).collect()]
    want = [_py_float_k(v) for v in vals]
    assert got == want
    # the boundary triple around each 2^j: (j, j+1, j)
    for j in range(-8, 12):
        i = (j + 8) * 3
        assert want[i] == j and want[i + 1] == j + 1 and want[i + 2] == j


def test_float_histogram_and_quantile(spark):
    """float_obs mode: (0,1) values land in negative-k buckets, v<=0 in
    the zero bucket, and the quantile walk matches a pure-Python replay
    (same bucket model, same interpolation)."""
    values = [((i * 37) % 1000) / 200.0 for i in range(500)]  # incl. 0.0
    values += [-1.25, 0.0]
    df = spark.createDataFrame([(v,) for v in values], "v double").withColumn(
        "g", F.lit("a")
    )
    hist = native_histogram_from_values(df, "v", ["g"], float_obs=True)
    h = hist.collect()[0]
    assert h["count"] == len(values)
    assert h["zero_count"] == sum(1 for v in values if v <= 0)
    want_buckets: dict[int, int] = {}
    for v in values:
        if v > 0:
            k = _py_float_k(v)
            want_buckets[k] = want_buckets.get(k, 0) + 1
    assert {b["k"]: b["c"] for b in h["buckets"]} == want_buckets
    assert min(want_buckets) < 0  # (0,1) observations exercised

    for q in (0.05, 0.5, 0.9):
        got = native_histogram_quantile(hist, q, ["g"]).collect()[0]["value"]
        # python reference walk
        zero = h["zero_count"]
        rank = q * len(values)
        if rank <= zero:
            want = 0.0
        else:
            cum = zero
            for k in sorted(want_buckets):
                c = want_buckets[k]
                cum += c
                if cum >= rank:
                    lower, upper = 2.0 ** (k - 1), 2.0 ** k
                    want = round(lower + (upper - lower)
                                 * ((rank - (cum - c)) / c), 6)
                    break
        assert got == want, (q, got, want)


def _py_float_k_schema(v: float, schema: int) -> int:
    sf = float(1 << schema)
    k0 = math.ceil(math.log2(v) * sf)
    if 2.0 ** ((k0 - 1) / sf) >= v:
        return k0 - 1
    if 2.0 ** (k0 / sf) < v:
        return k0 + 1
    return k0


def test_schema2_histogram_quantile_fraction(spark):
    """schema=2 (base = 2^0.25): four buckets per octave, the same
    cumulative walk and interpolation against a pure-Python replay of
    the identical candidate-then-correct formulas."""
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_fraction,
    )

    schema = 2
    sf = float(1 << schema)
    values = [((i * 53) % 800) / 100.0 for i in range(400)]  # [0, 8)
    df = spark.createDataFrame([(v,) for v in values], "v double").withColumn(
        "g", F.lit("a")
    )
    hist = native_histogram_from_values(
        df, "v", ["g"], float_obs=True, schema=schema
    )
    h = hist.collect()[0]
    assert h["schema"] == 2
    want_buckets: dict[int, int] = {}
    for v in values:
        if v > 0:
            k = _py_float_k_schema(v, schema)
            want_buckets[k] = want_buckets.get(k, 0) + 1
    assert {b["k"]: b["c"] for b in h["buckets"]} == want_buckets
    # four buckets per octave: spans of adjacent k cover ratios 2^0.25
    zero = h["zero_count"]
    assert zero == sum(1 for v in values if v <= 0)

    for q in (0.1, 0.5, 0.95):
        got = native_histogram_quantile(hist, q, ["g"]).collect()[0]["value"]
        rank = q * len(values)
        if rank <= zero:
            want = 0.0
        else:
            cum = zero
            for k in sorted(want_buckets):
                c = want_buckets[k]
                cum += c
                if cum >= rank:
                    lower = 2.0 ** ((k - 1) / sf)
                    upper = 2.0 ** (k / sf)
                    want = round(lower + (upper - lower)
                                 * ((rank - (cum - c)) / c), 6)
                    break
        assert got == want, (q, got, want)

    # fraction at a mid-octave bound, schema-aware containing bucket
    for ub in (1.0, 1.5, 3.3):
        got = native_histogram_fraction(
            hist, ub, ["g"], schema=schema
        ).collect()[0]["fraction"]
        k = _py_float_k_schema(ub, schema)
        lo, hi = 2.0 ** ((k - 1) / sf), 2.0 ** (k / sf)
        acc = float(zero)
        for kk, c in want_buckets.items():
            if kk < k:
                acc += c
            elif kk == k:
                acc += c * ((ub - lo) / (hi - lo))
        want = math.floor(acc / len(values) * 1e6 + 0.5) / 1e6
        assert got == want, (ub, got, want)


def test_schema_nonzero_requires_float_obs(spark):
    df = spark.createDataFrame([(4,)], "v long").withColumn("g", F.lit("a"))
    with pytest.raises(ValueError, match="float_obs"):
        native_histogram_from_values(df, "v", ["g"], schema=2)


def test_fraction_rejects_nonpositive_upper(spark):
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_fraction,
    )

    df = spark.createDataFrame([(4,)], "v long").withColumn("g", F.lit("a"))
    hist = native_histogram_from_values(df, "v", ["g"])
    with pytest.raises(ValueError):
        native_histogram_fraction(hist, 0.0, ["g"])


# ---------------------------------------------------------------------------
# r14: temporal operators — reset-aware increase/rate over a histogram
# SERIES, accessors, and the promql_expr wiring (verdict r13 #1/#2)
# ---------------------------------------------------------------------------


def _series_df(spark, samples, labels=("m", "i1")):
    """Build a tiny native-histogram series: samples is a list of
    (time, count, sum, zero_count, buckets-dict)."""
    rows = [
        (
            t,
            labels[0],
            labels[1],
            c,
            float(s),
            z,
            0,
            [{"k": k, "c": v} for k, v in sorted(b.items()) if v > 0],
        )
        for (t, c, s, z, b) in samples
    ]
    return spark.createDataFrame(
        rows,
        "time long, label_name string, label_instance string, "
        "count long, sum double, zero_count long, schema int, "
        "buckets array<struct<k: int, c: bigint>>",
    )


def test_increase_no_reset(spark):
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_increase,
    )

    df = _series_df(
        spark,
        [
            (0, 10, 100.0, 2, {0: 3, 2: 5}),
            (15000, 16, 160.0, 3, {0: 5, 2: 8}),
            (30000, 20, 200.0, 4, {0: 6, 2: 9, 3: 1}),
        ],
    )
    row = native_histogram_increase(
        df, ["label_name", "label_instance"], pin=False
    ).collect()[0]
    assert row["count"] == 10 and row["zero_count"] == 2
    assert row["sum"] == 100.0 and row["span_s"] == 30.0
    assert {b["k"]: b["c"] for b in row["buckets"]} == {0: 3, 2: 4, 3: 1}


def test_increase_detects_bucket_reset(spark):
    """A reset visible ONLY in one bucket (total count still grows)
    must restart every counter from 0 — whole-sample detection."""
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_increase,
    )

    df = _series_df(
        spark,
        [
            (0, 10, 100.0, 2, {0: 3, 2: 5}),
            # bucket 0 dropped 3 -> 1 (reset) even though count grew
            (15000, 11, 90.0, 1, {0: 1, 2: 9}),
        ],
    )
    row = native_histogram_increase(
        df, ["label_name", "label_instance"], pin=False
    ).collect()[0]
    # restart-from-0: the post-reset sample contributes its own values
    assert row["count"] == 11 and row["zero_count"] == 1
    assert {b["k"]: b["c"] for b in row["buckets"]} == {0: 1, 2: 9}


def test_increase_detects_vanished_bucket(spark):
    """A bucket present before and absent after is a decrease to 0."""
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_increase,
    )

    df = _series_df(
        spark,
        [
            (0, 5, 50.0, 0, {1: 5}),
            (15000, 6, 60.0, 0, {2: 6}),  # bucket 1 vanished -> reset
        ],
    )
    row = native_histogram_increase(
        df, ["label_name", "label_instance"], pin=False
    ).collect()[0]
    assert {b["k"]: b["c"] for b in row["buckets"]} == {2: 6}
    assert row["count"] == 6


def test_single_sample_series_emits_nothing(spark):
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_increase,
    )

    df = _series_df(spark, [(0, 10, 100.0, 2, {0: 3})])
    assert (
        native_histogram_increase(
            df, ["label_name", "label_instance"], pin=False
        ).count()
        == 0
    )


def test_rate_divides_every_payload_exactly(spark):
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_increase,
        native_histogram_rate,
    )

    df = _series_df(
        spark,
        [
            (0, 10, 100.0, 2, {0: 3, 2: 5}),
            (20000, 30, 300.0, 6, {0: 7, 2: 11}),
        ],
    )
    labels = ["label_name", "label_instance"]
    inc = native_histogram_increase(df, labels, pin=False).collect()[0]
    r = native_histogram_rate(df, labels, pin=False).collect()[0]
    assert r["count"] == inc["count"] / 20.0
    assert r["sum"] == inc["sum"] / 20.0
    assert r["zero_count"] == inc["zero_count"] / 20.0
    want = {b["k"]: b["c"] / 20.0 for b in inc["buckets"]}
    assert {b["k"]: b["c"] for b in r["buckets"]} == want


def test_promql_hist_instant_selector_and_accessors(spark):
    from tsdb_parquet_spark.promql_expr import query_instant

    df = _series_df(
        spark,
        [
            (0, 10, 100.0, 2, {0: 3, 2: 5}),
            (15000, 16, 160.0, 3, {0: 5, 2: 8}),
        ],
    )
    out = query_instant(df, "histogram_avg(m)", 15000).collect()
    assert len(out) == 1 and out[0]["value"] == 10.0  # 160/16


_GRID_SAMPLES = [
    (0, 10, 100.0, 2, {0: 3, 2: 5}),
    (15000, 16, 160.0, 3, {0: 5, 2: 8}),
    (30000, 20, 200.0, 4, {0: 6, 2: 9, 3: 1}),
]


def test_range_grid_increase_per_step(spark):
    """The step grid emits exactly the steps with >= 2 in-window
    samples, each the reset-aware increase over THAT step's window."""
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_range_increase,
    )

    df = _series_df(spark, _GRID_SAMPLES)
    rows = {
        r["step_ts"]: r
        for r in native_histogram_range_increase(
            df, ["label_name", "label_instance"], 0, 60000, 15000, 30000,
            pin=False,
        ).collect()
    }
    # ts=0 (one sample), ts=45000/60000 (<= one sample) emit nothing
    assert set(rows) == {15000, 30000}
    r1 = rows[15000]  # window (-15s, 15s]: pair 0->15000
    assert r1["count"] == 6 and r1["zero_count"] == 1
    assert {b["k"]: b["c"] for b in r1["buckets"]} == {0: 2, 2: 3}
    assert r1["span_s"] == 15.0
    r2 = rows[30000]  # window (0, 30s]: sample at 0 excluded -> one pair
    assert r2["count"] == 4 and r2["zero_count"] == 1
    assert {b["k"]: b["c"] for b in r2["buckets"]} == {0: 1, 2: 1, 3: 1}
    assert r2["span_s"] == 15.0


def test_promql_hist_range_grid_matches_instant(spark):
    """query_range over the native-histogram family == query_instant
    at each grid point — the float-path invariant carried over."""
    from tsdb_parquet_spark.promql_expr import query_instant, query_range

    df = _series_df(spark, _GRID_SAMPLES)
    for expr in (
        "histogram_quantile(0.5, increase(m[30s]))",
        "histogram_sum(rate(m[30s]))",
        "histogram_avg(m)",
        "histogram_fraction(0, 4, increase(m[30s]))",
    ):
        grid = {
            r["step_ts"]: r["value"]
            for r in query_range(df, expr, 0, 30000, 15000).collect()
        }
        for ts in (0, 15000, 30000):
            inst = query_instant(df, expr, ts).collect()
            want = inst[0]["value"] if inst else None
            assert grid.get(ts) == want, (expr, ts, grid.get(ts), want)


def test_range_grid_at_modifier_replicates_instant(spark):
    """`m @ ts` over a native-histogram selector in a range query:
    the fixed-time instant histogram replicated per step (the float @
    convention) — previously crashed in the float instant_vector
    path (code-review r15)."""
    from tsdb_parquet_spark.promql_expr import query_range

    df = _series_df(spark, _GRID_SAMPLES)
    out = query_range(
        df, "histogram_sum(m @ 15)", 0, 30000, 15000
    ).collect()
    assert {r["step_ts"] for r in out} == {0, 15000, 30000}
    assert {r["value"] for r in out} == {160.0}


def test_fraction_empty_vector_in_empty_out(spark):
    """Instant outside the staleness window: empty vector in, empty
    vector out (advice r14) — not a driver-side schema error."""
    from tsdb_parquet_spark.promql_expr import query_instant

    df = _series_df(spark, [(0, 10, 100.0, 2, {0: 3})])
    out = query_instant(df, "histogram_fraction(0, 4, m)", 10_000_000)
    assert out.count() == 0
    assert out.columns[-1] == "value"


def test_fraction_hi_le_lo_is_zero(spark):
    """hi <= lo: Prometheus yields 0 for every matched series."""
    from tsdb_parquet_spark.promql_expr import query_instant

    df = _series_df(spark, [(0, 10, 100.0, 2, {0: 3})])
    out = query_instant(df, "histogram_fraction(2, 1, m)", 0).collect()
    assert len(out) == 1 and out[0]["value"] == 0.0


def test_histogram_stddev_native_matches_python(spark):
    """Upstream funcHistogramStdDev semantics: geometric bucket
    midpoints, zero bucket at 0, true mean sum/count."""
    import math

    from tsdb_parquet_spark.promql_expr import query_instant, query_range

    df = _series_df(spark, [(0, 20, 30.0, 5, {1: 10, 2: 5})])
    mean = 30.0 / 20
    mids = {1: math.sqrt(1 * 2), 2: math.sqrt(2 * 4)}
    var = (
        5 * mean * mean
        + 10 * (mids[1] - mean) ** 2
        + 5 * (mids[2] - mean) ** 2
    ) / 20
    out = query_instant(df, "histogram_stddev(m)", 0).collect()
    assert len(out) == 1 and out[0]["value"] == round(math.sqrt(var), 6)
    out = query_instant(df, "histogram_stdvar(m)", 0).collect()
    assert out[0]["value"] == round(var, 6)
    # grid: step_ts rides as one more label through the same plan
    grid = query_range(df, "histogram_stddev(m)", 0, 30000, 15000).collect()
    assert {r["value"] for r in grid} == {round(math.sqrt(var), 6)}
    assert {r["step_ts"] for r in grid} == {0, 15000, 30000}


def test_histogram_stddev_classic_convention(spark):
    """Classic layout: arithmetic midpoints, +Inf pinned at the highest
    finite le, midpoint-estimated mean (documented engine extension)."""
    import math

    from tsdb_parquet_spark.promql_expr import query_instant

    rows = [
        (0, "mb", "h1", "0.1", 4.0),
        (0, "mb", "h1", "0.5", 9.0),
        (0, "mb", "h1", "+Inf", 10.0),
    ]
    cdf = spark.createDataFrame(
        rows,
        "time long, label_name string, label_handler string, "
        "label_le string, value double",
    )
    c, mid, tot = [4, 5, 1], [0.05, 0.3, 0.5], 10
    mean = sum(ci * mi for ci, mi in zip(c, mid)) / tot
    var = sum(ci * (mi - mean) ** 2 for ci, mi in zip(c, mid)) / tot
    out = query_instant(cdf, "histogram_stddev(mb)", 0).collect()
    assert len(out) == 1 and out[0]["value"] == math.sqrt(var)


def test_fraction_two_bound_rounds_once(spark):
    """fraction(lo, hi) == round(raw(hi) - raw(lo), 6) — the bounds are
    not individually rounded before the subtraction (advice r14)."""
    from tsdb_parquet_spark.native_histogram import (
        native_histogram_fraction,
    )
    from tsdb_parquet_spark.promql_expr import query_instant

    df = _series_df(spark, _GRID_SAMPLES)
    labels = ["label_name", "label_instance"]
    raw = {
        b: native_histogram_fraction(
            query_instant(df, "m", 0), b, labels, round_dp=None
        ).collect()[0]["fraction"]
        for b in (1.5, 3.0)
    }
    out = query_instant(df, "histogram_fraction(1.5, 3, m)", 0).collect()
    assert len(out) == 1
    assert out[0]["value"] == round(raw[3.0] - raw[1.5], 6)


def test_promql_hist_unsupported_range_fn(spark):
    from tsdb_parquet_spark.promql_expr import query_instant

    df = _series_df(spark, [(0, 10, 100.0, 2, {0: 3})])
    with pytest.raises(ValueError, match="rate/increase only"):
        query_instant(df, "avg_over_time(m[30s])", 15000)
