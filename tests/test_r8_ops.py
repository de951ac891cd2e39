"""Round-8 operator tests: interval-union family, Bloom-prefiltered
decontamination, SemDeDup, Gopher rules, RRF fusion, per-series OLS,
stream-static enrichment."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- intervals

def _islands_ref(rows, bridge_gap=0):
    """Brute-force island reference: per key, sorted sweep."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in rows:
        by_key[k].append((s, e))
    out = []
    for k, ivs in by_key.items():
        ivs.sort()
        cur = None
        for s, e in ivs:
            if cur is None or s > cur[1] + bridge_gap:
                if cur is not None:
                    out.append((k, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        if cur is not None:
            out.append((k, cur[0], cur[1], cur[2]))
    return sorted(out)


def test_interval_islands_matches_brute_force(spark):
    from tsdb_parquet_spark.operators.intervals import interval_islands

    rng = random.Random(8)
    rows = [
        (f"k{rng.randrange(4)}", s := rng.randrange(0, 1000), s + rng.randrange(0, 60))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in interval_islands(df, "s", "e", ["k"]).collect()
    )
    ref = _islands_ref(rows)
    assert got == [tuple(r) for r in ref]


def test_interval_islands_touch_merges_gap_splits(spark):
    from tsdb_parquet_spark.operators.intervals import interval_islands

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 10, 20), ("a", 22, 30)], "k string, s long, e long"
    )
    out = sorted(tuple(r) for r in interval_islands(df, "s", "e", ["k"]).collect())
    assert out == [("a", 0, 20, 2), ("a", 22, 30, 1)]
    # bridge_gap=2 bridges the 2-unit gap
    out2 = interval_islands(df, "s", "e", ["k"], bridge_gap=2).collect()
    assert [tuple(r) for r in out2] == [("a", 0, 30, 3)]


def test_interval_coverage_and_uptime(spark):
    from tsdb_parquet_spark.operators.intervals import (
        heartbeat_uptime, interval_coverage)

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 15), ("a", 100, 110)], "k string, s long, e long"
    )
    r = interval_coverage(df, "s", "e", ["k"]).first()
    assert (r["covered"], r["n_islands"], r["gap_time"], r["n_intervals"]) == (
        25, 2, 85, 3)
    hb = spark.createDataFrame([("x", 0), ("x", 5), ("x", 30)], "k string, t long")
    u = heartbeat_uptime(hb, "t", 10, ["k"]).first()
    assert (u["covered"], u["n_islands"]) == (25, 2)


def test_interval_islands_single_exchange(spark):
    # the window exchange is the ONLY shuffle: the island aggregate's
    # grouping keys are a superset of the window partition keys
    from tsdb_parquet_spark.operators.intervals import interval_islands

    df = spark.createDataFrame(
        [("a", 0, 10), ("b", 5, 15)], "k string, s long, e long"
    )
    plan = interval_islands(df, "s", "e", ["k"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.lower().count("exchange") <= 1, plan


# -------------------------------------------------------------------- bloom

def test_bloom_decontaminate_equals_plain(spark):
    from tsdb_parquet_spark.llm.corpus import bloom_decontaminate, decontaminate

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 30))))
        for i in range(60)
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    bench = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    for n in (3, 8):
        a = sorted(
            (r["doc_id"], r["n_hits"], r["contaminated"])
            for r in bloom_decontaminate(corpus, bench, n=n).collect()
        )
        b = sorted(
            (r["doc_id"], r["n_hits"], r["contaminated"])
            for r in decontaminate(corpus, bench, n=n).collect()
        )
        assert a == b


def test_bloom_decontaminate_empty_benchmark(spark):
    from tsdb_parquet_spark.llm.corpus import bloom_decontaminate

    d = spark.createDataFrame(
        [(1, "a b c d e f g h i")], "doc_id long, text string"
    )
    bench = d.filter(F.lit(False))
    out = bloom_decontaminate(d, bench, n=8).collect()
    assert [(r["n_hits"], r["contaminated"]) for r in out] == [(0, False)]


# ----------------------------------------------------------------- semdedup

def test_semdedup_drops_near_duplicates_only(spark):
    from tsdb_parquet_spark.llm.dedup import semdedup

    rng = random.Random(3)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(20)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # ids 100/101: exact copies of id 0 and 1 — must not BOTH survive
    rows += [(100, rows[0][1]), (101, rows[1][1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, k=3, threshold=0.999)
    ids = {r["vec_id"] for r in out.collect()}
    assert len({0, 100} & ids) == 1  # one of each duplicate pair survives
    assert len({1, 101} & ids) == 1
    # all non-duplicated vectors survive at a 0.999 threshold
    assert set(range(2, 20)) <= ids


def test_semdedup_deterministic(spark):
    from tsdb_parquet_spark.llm.dedup import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(tuple(r) for r in semdedup(emb, k=4, threshold=0.42).collect())
    b = sorted(tuple(r) for r in semdedup(emb, k=4, threshold=0.42).collect())
    assert a == b and len(a) > 0


def test_semdedup_production_k_arrow_path_matches_numpy_replay(spark):
    """The k > 8 path (r15: mapInArrow assign + applyInArrow pairwise,
    zero-copy buffer reshape, id-hash repartition) must produce exactly
    the survivors a driver-side numpy replay of the documented contract
    produces — assignment argmax with ties to the HIGHER seed index,
    drop iff ANY earlier-(rank, id) cluster member reaches the
    threshold."""
    import hashlib

    import numpy as np

    from tsdb_parquet_spark.llm.dedup import semdedup

    rng = random.Random(7)
    n, dim, k, thr = 300, 8, 12, 0.97
    rows = [(i, [float(rng.gauss(0, 1)) for _ in range(dim)])
            for i in range(n)]
    rows += [(1000 + i, rows[i][1]) for i in range(10)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["vec_id"], r["cluster"])
           for r in semdedup(df, k=k, threshold=thr).collect()}

    # ---- replay (float32 storage -> float64 math, like the engine)
    ids = np.array([r[0] for r in rows])
    embs = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    rk = np.array([hashlib.md5(f"{i}semdedup".encode()).hexdigest()
                   for i in ids])
    seed_order = np.lexsort((ids, rk))[:k]
    mat = embs[seed_order].T
    mat = mat / np.linalg.norm(mat, axis=0, keepdims=True)
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    scores = (embs / norms) @ mat
    cl = scores.shape[1] - 1 - np.argmax(scores[:, ::-1], axis=1)
    want = set()
    for c in np.unique(cl):
        sel = np.where(cl == c)[0]
        order = sel[np.lexsort((ids[sel], rk[sel]))]
        e = embs[order] / norms[order]
        s = e @ e.T
        for i in range(len(order)):
            if not any(s[i, j] >= thr for j in range(i)):
                want.add((int(ids[order[i]]), int(c)))
    assert got == want and len(got) < len(rows)


# ------------------------------------------------------------- gopher rules

def test_gopher_rules_flags(spark):
    from tsdb_parquet_spark.llm.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and that have "
                "been with many other words to make this long enough for all"),
            (2, "### #### ##### ###"),                      # symbol soup
            (3, "- one\n- two\n- three\n- four"),           # bullet lines
            (4, "ok then...\nand so...\nmore still..."),    # ellipsis lines
            (5, ""),                                        # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs, min_words=10).collect()}
    assert out[1]["keep"] is True
    assert out[2]["r_symbol_ratio"] is False and out[2]["r_alpha_words"] is False
    assert out[3]["r_bullet_lines"] is False
    assert out[4]["r_ellipsis_lines"] is False
    assert out[5]["keep"] is False and out[5]["n_words"] == 0


def test_gopher_rules_word_and_stopword_bounds(spark):
    from tsdb_parquet_spark.llm.text import gopher_rules

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "the cat and the hat see saw")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           gopher_rules(docs, min_words=3, min_stopwords=2).collect()}
    assert out[1]["r_word_count"] is True and out[1]["r_stopwords"] is False
    assert out[2]["n_stopwords_present"] == 2 and out[2]["r_stopwords"] is True


# ---------------------------------------------------------------------- rrf

def test_rrf_fuse_math_and_absence(spark):
    from tsdb_parquet_spark.llm.ranking import rrf_fuse

    l1 = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    l2 = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([l1, l2], k=60).collect()}
    assert out[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)
    assert out[1]["rrf_score"] == pytest.approx(1 / 61, abs=1e-9)
    assert out[1]["rank_1"] is None and out[3]["rank_0"] is None
    # doc 2 (in both lists) outranks single-list docs
    top = rrf_fuse([l1, l2], k=60).first()
    assert top["doc_id"] == 2


def test_rrf_fuse_requires_lists(spark):
    from tsdb_parquet_spark.llm.ranking import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


# ------------------------------------------------------------------- linreg

def test_linreg_exact_line_and_degenerates(spark):
    from tsdb_parquet_spark.timeseries import linreg_per_series

    rows = (
        # s: v = 2 + 0.003*t(ms) exactly, in 1e-6 units
        [("s", t, 2.0 + 0.003 * t) for t in range(0, 10000, 1000)]
        # flat: slope 0, r2 undefined
        + [("flat", t, 5.0) for t in range(0, 5000, 1000)]
        # single point: no fit
        + [("one", 0, 1.0)]
    )
    df = spark.createDataFrame(rows, "label_name string, time long, value double")
    out = {r["label_name"]: r for r in
           linreg_per_series(df, labels=["label_name"]).collect()}
    assert out["s"]["slope"] == pytest.approx(0.003, rel=1e-9)
    assert out["s"]["intercept"] == pytest.approx(2.0, rel=1e-9)
    assert out["s"]["r2"] == pytest.approx(1.0, abs=1e-9)
    assert out["flat"]["slope"] == pytest.approx(0.0, abs=1e-9)
    assert out["flat"]["r2"] is None
    assert out["one"]["slope"] is None and out["one"]["n"] == 1


def test_linreg_slope_per_scaling(spark):
    from tsdb_parquet_spark.timeseries import linreg_per_series

    df = spark.createDataFrame(
        [("s", t, 1e-7 * t) for t in range(0, 3_600_000 * 3, 600_000)],
        "label_name string, time long, value double",
    )
    per_hour = linreg_per_series(
        df, labels=["label_name"], slope_per=3_600_000
    ).first()
    assert per_hour["slope"] == pytest.approx(0.36, rel=1e-6)


def test_linreg_single_aggregate_no_window(spark):
    from tsdb_parquet_spark.timeseries import linreg_per_series

    df = spark.createDataFrame(
        [("s", 0, 1.0), ("s", 1, 2.0)], "label_name string, time long, value double"
    )
    plan = linreg_per_series(df, labels=["label_name"])._jdf.queryExecution(
    ).executedPlan().toString().lower()
    assert "window" not in plan
    assert plan.count("exchange") <= 1


# ---------------------------------------------------- stream-static enrich

def test_stream_static_enrich_batch_equivalence(spark, tmp_path):
    from tsdb_parquet_spark.streaming.windows import stream_static_enrich

    events = spark.createDataFrame(
        [(i, i % 3, "t%d" % (i % 2), float(i)) for i in range(30)],
        "event_id long, user_id long, event_type string, value double",
    )
    dim = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "A")], "c_custkey long, c_mktsegment string"
    )
    batch = {
        (r["c_mktsegment"], r["event_type"]): (r["n"], r["sv"])
        for r in stream_static_enrich(events, dim).collect()
    }
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_static_enrich(stream, dim)
        .writeStream.format("memory")
        .queryName("r8_enrich_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["c_mktsegment"], r["event_type"]): (r["n"], r["sv"])
        for r in spark.table("r8_enrich_test").collect()
    }
    assert got == batch
    # the static side must broadcast in the streaming plan
    assert len(batch) == 4


def test_cli_r8_commands_smoke(spark, capsys):
    from tsdb_parquet_spark.cli import main

    main(["uptime", "/root/testdata/sf0.001/embeddings.parquet",
          "--key", "label", "--ts", "vec_id", "--liveness", "3",
          "--limit", "2"])
    main(["semdedup", "/root/testdata/sf0.001/embeddings.parquet",
          "--k", "4", "--threshold", "0.42", "--limit", "2"])
    main(["gopher", "/root/testdata/sf0.001/documents.parquet",
          "--min-words", "5", "--limit", "2"])
    out = capsys.readouterr().out
    assert "survivors" in out and "covered" in out and "keep" in out


# ------------------------------------------------- state/percentile/latest

def test_state_agg_semantics(spark):
    from tsdb_parquet_spark.operators.intervals import state_agg

    df = spark.createDataFrame(
        [("u1", 0, "idle"), ("u1", 10, "run"), ("u1", 30, "idle"),
         ("u1", 35, "idle"), ("u2", 0, "run")],
        "k string, t long, s string",
    )
    got = {(r["k"], r["state"]): (r["duration"], r["n_visits"])
           for r in state_agg(df, "s", "t", ["k"]).collect()}
    # re-asserted idle at 35 merges into the held span; durations exact
    assert got[("u1", "idle")] == (15, 3)
    assert got[("u1", "run")] == (20, 1)
    assert got[("u2", "run")] == (None, 1)  # open-ended: no invented time
    bounded = {(r["k"], r["state"]): r["duration"] for r in
               state_agg(df, "s", "t", ["k"], end_time=100).collect()}
    assert bounded[("u1", "idle")] == 80 and bounded[("u2", "run")] == 100


def test_weighted_percentile_exact_and_validation(spark):
    from tsdb_parquet_spark.operators.aggregates import weighted_percentile

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 98), ("b", 5.0, 10)],
        "k string, v double, w int",
    )
    got = {r["k"]: r for r in
           weighted_percentile(df, "v", "w", [1, 2, 50, 100], ["k"]).collect()}
    assert got["a"]["p1"] == 1.0      # cum 1 covers 1% of 100
    assert got["a"]["p2"] == 2.0      # cum 2 covers 2%
    assert got["a"]["p50"] == 3.0     # the heavy tail value
    assert got["a"]["p100"] == 3.0
    assert got["b"]["total_weight"] == 10
    with pytest.raises(ValueError):
        weighted_percentile(df, "v", "w", [])
    with pytest.raises(ValueError):
        weighted_percentile(df, "v", "w", [0])


def test_latest_by_key_no_sort_in_plan(spark):
    from tsdb_parquet_spark.operators.aggregates import latest_by_key

    df = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 10, "z"), (1, 20, "w")],
        "id long, ver long, payload string",
    )
    out = latest_by_key(df, ["id"], "ver", "payload")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(1, 20, "y"), (2, 10, "z")]  # tie 20/20 -> max payload
    # fresh plan (pre-execution): the AQE final-plan string repeats the
    # materialized stage's exchange, inflating naive counts
    plan = latest_by_key(df, ["id"], "ver", "payload")._jdf.queryExecution(
    ).executedPlan().toString().lower()
    # variable-width payload buffer -> documented SortAggregate fallback
    # (SCALE.md 5b); the win is the partial combine: one candidate per
    # (task, key) crosses the single exchange, never the full history
    assert "partial_max_by" in plan, plan
    # AQE's final plan repeats the stage boundary; count real exchanges
    assert plan.count("exchange hashpartitioning") <= 1


def test_upsert_sink_idempotent_and_batch_order_independent(spark, tmp_path):
    from tsdb_parquet_spark.operators.aggregates import latest_by_key
    from tsdb_parquet_spark.streaming.upsert import (
        read_upsert_view,
        upsert_latest_sink,
    )

    rows = [(i % 5, i, f"p{i}") for i in range(40)]  # 5 keys, 8 versions each
    df = spark.createDataFrame(rows, "k long, ver long, payload string")
    want = sorted(tuple(r) for r in
                  latest_by_key(df, ["k"], "ver", "payload").collect())

    path = str(tmp_path / "view")
    sink = upsert_latest_sink(path, ["k"], "ver", "payload")
    # apply in 4 out-of-order batches
    for lo, hi in ((30, 40), (0, 10), (20, 30), (10, 20)):
        sink(df.filter((F.col("ver") >= lo) & (F.col("ver") < hi)), hi)
    got = sorted(tuple(r) for r in read_upsert_view(spark, path).collect())
    assert got == want
    # at-least-once replay: re-applying an old batch is a no-op
    sink(df.filter(F.col("ver") < 10), 99)
    got2 = sorted(tuple(r) for r in read_upsert_view(spark, path).collect())
    assert got2 == want


def test_upsert_sink_rewrites_only_dirty_buckets(spark, tmp_path):
    """The 100 TB property: a micro-batch touching one key must leave
    every other bucket's on-disk files byte-identical (same paths, same
    mtimes) — proof the merge reads/rewrites O(touched partitions), not
    the whole view."""
    import glob
    import os

    from tsdb_parquet_spark.streaming.upsert import (
        read_upsert_view,
        upsert_latest_sink,
    )

    path = str(tmp_path / "view")
    sink = upsert_latest_sink(path, ["k"], "ver", "payload", n_buckets=8)
    df = spark.createDataFrame(
        [(i, 1, f"v1_{i}") for i in range(64)], "k long, ver long, payload string"
    )
    sink(df, 0)
    buckets = sorted(glob.glob(os.path.join(path, "__kb=*")))
    assert len(buckets) == 8  # 64 keys cover all 8 buckets
    before = {
        b: sorted(
            (f, os.path.getmtime(os.path.join(b, f)))
            for f in os.listdir(b) if f.endswith(".parquet")
        )
        for b in buckets
    }

    # update ONE key -> exactly one dirty bucket
    upd = spark.createDataFrame([(7, 2, "v2_7")], "k long, ver long, payload string")
    sink(upd, 1)
    dirty = [
        b for b in buckets
        if sorted(
            (f, os.path.getmtime(os.path.join(b, f)))
            for f in os.listdir(b) if f.endswith(".parquet")
        ) != before[b]
    ]
    assert len(dirty) == 1, dirty

    view = {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()}
    assert view[7] == "v2_7" and view[6] == "v1_6" and len(view) == 64


def test_upsert_sink_recovers_every_crash_window(spark, tmp_path):
    """Each sequence point of the staged swap, induced by hand, must be
    repaired by _recover + an idempotent batch replay — the durability
    contract that replaced r9's dynamic-partition-overwrite (whose
    delete/rename window lost a bucket's untouched keys for good)."""
    import glob
    import os
    import shutil

    from tsdb_parquet_spark.streaming.upsert import (
        read_upsert_view,
        upsert_latest_sink,
    )

    path = str(tmp_path / "view")
    sink = upsert_latest_sink(path, ["k"], "ver", "payload", n_buckets=4)
    base = spark.createDataFrame(
        [(i, 1, f"v1_{i}") for i in range(32)], "k long, ver long, payload string"
    )
    sink(base, 0)
    want = {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()}
    upd = spark.createDataFrame([(3, 2, "v2_3")], "k long, ver long, payload string")

    buckets = sorted(glob.glob(os.path.join(path, "__kb=*")))

    # window 1: crash after staging written, before any swap — the live
    # view reads intact; the READER leaves the stale staging alone (it
    # cannot tell a dead writer from a live one — advice r10), and the
    # next WRITER batch drops it
    shutil.copytree(buckets[0], os.path.join(path, ".staging", os.path.basename(buckets[0])))
    assert {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()} == want
    assert os.path.isdir(os.path.join(path, ".staging"))
    sink(upd, 1)
    want[3] = "v2_3"
    assert not os.path.exists(os.path.join(path, ".staging"))
    assert {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()} == want

    # window 2: crash between live->bak and staged->live (live missing):
    # the bak must roll BACK so no key in that bucket is lost — this the
    # reader does perform (best-effort rename, no deletes)
    b0 = os.path.basename(buckets[0])
    os.rename(buckets[0], os.path.join(path, "." + b0 + ".__bak"))
    assert {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()} == want
    assert os.path.isdir(buckets[0])

    # window 3: crash after staged->live, before bak delete (both exist):
    # bak is the OLD data; the reader keeps serving the live dir and
    # leaves the bak for the writer, which discards it
    shutil.copytree(buckets[0], os.path.join(path, "." + b0 + ".__bak"))
    assert {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()} == want
    assert os.path.isdir(os.path.join(path, "." + b0 + ".__bak"))

    # and the replay after any repair converges: apply the update twice
    sink(upd, 1)
    sink(upd, 1)
    assert not os.path.exists(os.path.join(path, "." + b0 + ".__bak"))
    got = {r["k"]: r["payload"] for r in read_upsert_view(spark, path).collect()}
    assert got == want


def test_weighted_percentile_property_vs_python(spark):
    from tsdb_parquet_spark.operators.aggregates import weighted_percentile

    rng = random.Random(11)
    rows = [
        (f"k{rng.randrange(3)}", round(rng.uniform(0, 100), 2),
         rng.randrange(1, 20))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, v double, w int")
    got = {r["k"]: r for r in
           weighted_percentile(df, "v", "w", [25, 50, 75, 95], ["k"]).collect()}

    from collections import defaultdict
    by_k = defaultdict(list)
    for k, v, w in rows:
        by_k[k].append((v, w))
    for k, vw in by_k.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        assert got[k]["total_weight"] == tot
        for p in (25, 50, 75, 95):
            cum = 0
            want = None
            for v, w in vw:
                cum += w
                if cum * 100 >= p * tot:
                    want = v
                    break
            assert got[k][f"p{p}"] == want, (k, p)


def test_state_agg_property_vs_python(spark):
    from tsdb_parquet_spark.operators.intervals import state_agg

    rng = random.Random(7)
    rows = [
        (f"u{rng.randrange(5)}", t, f"s{rng.randrange(3)}")
        for t in rng.sample(range(10_000), 300)
    ]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    got = {(r["k"], r["state"]): (r["duration"], r["n_visits"])
           for r in state_agg(df, "s", "t", ["k"], end_time=20_000).collect()}

    from collections import defaultdict
    by_k = defaultdict(list)
    for k, t, s in rows:
        by_k[k].append((t, s))
    want = {}
    for k, ev in by_k.items():
        ev.sort()
        for i, (t, s) in enumerate(ev):
            nt = ev[i + 1][0] if i + 1 < len(ev) else 20_000
            d, n = want.get((k, s), (0, 0))
            want[(k, s)] = (d + (nt - t), n + 1)
    assert got == want


def test_mmr_rerank_matches_python_reference_and_suppresses_clones(spark):
    import numpy as np
    from tsdb_parquet_spark.llm.ranking import mmr_rerank

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)], rng.random())
            for i in range(30)]
    rows[10] = (10, [x * 1.001 for x in rows[0][1]], rows[0][2] - 0.01)
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>, rel double")
    got = [(r["doc_id"], r["mmr_rank"], round(r["mmr_score"], 9))
           for r in mmr_rerank(df, k=6, lam=0.7).collect()]

    # pure-Python greedy reference
    embs = np.array([r[1] for r in rows])
    unit = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    rel = np.array([r[2] for r in rows])
    chosen, max_sim = [], np.zeros(len(rows))
    avail = np.ones(len(rows), dtype=bool)
    want = []
    for rank in range(6):
        mmr = 0.7 * rel - 0.3 * max_sim
        mmr[~avail] = -np.inf
        i = int(np.argmax(mmr))
        want.append((rows[i][0], rank + 1, round(float(mmr[i]), 9)))
        avail[i] = False
        max_sim = np.maximum(max_sim, unit @ unit[i])
    assert got == want
    ids = [g[0] for g in got]
    assert not (0 in ids and 10 in ids)  # the near-clone never rides along


def test_mmr_rerank_grouped(spark):
    from tsdb_parquet_spark.llm.ranking import mmr_rerank

    rows = [("a", 1, [1.0, 0.0], 0.9), ("a", 2, [0.0, 1.0], 0.5),
            ("b", 3, [1.0, 1.0], 0.7)]
    df = spark.createDataFrame(
        rows, "q string, doc_id long, embedding array<double>, rel double")
    out = mmr_rerank(df, k=2, lam=0.5, group_col="q")
    got = {(r["q"], r["mmr_rank"]): r["doc_id"] for r in out.collect()}
    assert got == {("a", 1): 1, ("a", 2): 2, ("b", 1): 3}


def test_corpus_report_dup_and_majority(spark):
    from tsdb_parquet_spark.llm.corpus import corpus_report

    docs = spark.createDataFrame(
        [(1, "same text here", "en", "a"), (2, "same text here", "en", "a"),
         (3, "unique one", "de", "a"), (4, "same text here", "en", "b"),
         (5, "other", "de", "b"), (6, "more", "de", "b")],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r for r in corpus_report(docs).collect()}
    # cross-source mirror: doc 4 counts as dup in b too
    assert got["a"]["dup_docs"] == 2 and got["b"]["dup_docs"] == 1
    assert got["a"]["n_docs"] == 3 and got["a"]["total_tokens"] == 8
    assert got["a"]["major_lang"] == "en" and got["a"]["n_langs"] == 2
    assert got["b"]["major_lang"] == "de"  # 2 de vs 1 en


def test_interval_gaps_complement(spark):
    from tsdb_parquet_spark.operators.intervals import interval_gaps

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 20, 30), ("a", 50, 60), ("b", 0, 5)],
        "k string, s long, e long",
    )
    got = sorted(tuple(r) for r in interval_gaps(df, "s", "e", ["k"]).collect())
    assert got == [("a", 10, 20, 10), ("a", 30, 50, 20)]  # b: no internal gap


def test_audio_features_reference(spark):
    import math
    from tsdb_parquet_spark.llm.multimodal import (
        audio_features, wav_encode)

    # 2 frames at 8000Hz/25ms = 200 samples each: frame1 silence,
    # frame2 a +/-1000 square wave (alternating -> max ZCR)
    samples = [0] * 200 + [1000 if i % 2 == 0 else -1000 for i in range(200)]
    df = spark.createDataFrame(
        [(1, bytearray(wav_encode(samples)))], "item_id long, content binary"
    )
    r = audio_features(df, frame_ms=25).first()
    assert r["n_frames"] == 2
    assert r["max_rms"] == pytest.approx(1000 / 32768, abs=1e-6)
    assert r["mean_rms"] == pytest.approx((0 + 1000 / 32768) / 2, abs=1e-6)
    # frame1 ZCR 0 (signbit constant over zeros), frame2 alternates every
    # sample -> 199/199 = 1.0; mean = 0.5
    assert r["mean_zcr"] == pytest.approx(0.5, abs=1e-6)
    # short clip pads to one frame
    short = spark.createDataFrame(
        [(2, bytearray(wav_encode([100] * 7)))], "item_id long, content binary"
    )
    assert audio_features(short, frame_ms=25).first()["n_frames"] == 1


def test_psi_drift_zero_for_identical_and_eps_smoothing(spark):
    from tsdb_parquet_spark.llm.corpus import psi_drift

    df = spark.createDataFrame([(i, i % 100) for i in range(200)], "id long, v int")
    out = {r["bin"]: r for r in psi_drift(df, df, "v", bin_width=10, n_bins=10).collect()}
    assert out[-1]["psi_term"] == pytest.approx(0.0, abs=1e-9)  # identical -> 0
    # a bin present only in ref survives via eps smoothing, finite term
    cur = df.filter(F.col("v") < 50)
    out2 = {r["bin"]: r for r in psi_drift(df, cur, "v", bin_width=10, n_bins=10).collect()}
    assert out2[9]["p_cur"] == pytest.approx(1e-6, abs=1e-12)
    assert math.isfinite(out2[-1]["psi_term"]) and out2[-1]["psi_term"] > 0.25
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", bin_width=0)


def test_profile_table_one_pass_and_values(spark):
    from tsdb_parquet_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)],
        "id long, s string, v double",
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_distinct"] == 3
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_v"] is None  # non-numeric: no range
    assert out["v"]["min_v"] == 1.5 and out["v"]["max_v"] == 2.5
    # one scan: a single aggregate (Expand handles the multi-distinct)
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") == 1, plan


def test_manifest_sink_idempotent_and_batch_order_independent(spark, tmp_path):
    from tsdb_parquet_spark.operators.aggregates import latest_by_key
    from tsdb_parquet_spark.streaming.commitlog import (
        read_manifest_view,
        upsert_latest_sink_manifest,
    )

    rows = [(i % 5, i, f"p{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "k long, ver long, payload string")
    want = sorted(
        tuple(r) for r in latest_by_key(df, ["k"], "ver", "payload").collect()
    )

    path = str(tmp_path / "mview")
    sink = upsert_latest_sink_manifest(path, ["k"], "ver", "payload")
    for lo, hi in ((30, 40), (0, 10), (20, 30), (10, 20)):
        sink(df.filter((F.col("ver") >= lo) & (F.col("ver") < hi)), hi)
    got = sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    )
    assert got == want
    # at-least-once replay: re-applying an old batch is a no-op
    sink(df.filter(F.col("ver") < 10), 99)
    got2 = sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    )
    assert got2 == want


def test_manifest_sink_immutable_generations_and_touched_only(spark, tmp_path):
    """The object-store property: a micro-batch NEVER rewrites or
    renames an existing file — untouched buckets' generation dirs stay
    byte-identical and the new manifest carries their entries forward;
    only touched buckets get a new generation."""
    import glob
    import os

    from tsdb_parquet_spark.streaming.commitlog import (
        latest_manifest,
        read_manifest_view,
        upsert_latest_sink_manifest,
    )

    path = str(tmp_path / "mview")
    sink = upsert_latest_sink_manifest(path, ["k"], "ver", "payload", n_buckets=8)
    df = spark.createDataFrame(
        [(i, 1, f"v1_{i}") for i in range(64)], "k long, ver long, payload string"
    )
    sink(df, 0)
    v1, m1 = latest_manifest(spark, path)
    assert v1 == 1 and len(m1) == 8
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "data", "*", "*", "*.parquet"))
    }

    upd = spark.createDataFrame(
        [(7, 2, "v2_7")], "k long, ver long, payload string"
    )
    sink(upd, 1)
    v2, m2 = latest_manifest(spark, path)
    assert v2 == 2
    # every pre-existing data file is untouched (immutability)
    for f, mt in files_before.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mt
    # exactly one bucket entry moved to a new generation
    moved = [k for k in m1 if m1[k] != m2[k]]
    assert len(moved) == 1
    view = {
        r["k"]: r["payload"] for r in read_manifest_view(spark, path).collect()
    }
    assert view[7] == "v2_7" and view[6] == "v1_6" and len(view) == 64


def test_manifest_crash_windows_and_torn_commit(spark, tmp_path):
    """Every crash window of the commit protocol leaves a readable
    view with NO repair step: (a) generation written but no manifest ->
    old version stays current, replay converges; (b) torn manifest
    (half-written JSON) -> reader falls back one version."""
    import os

    from tsdb_parquet_spark.operators.aggregates import latest_by_key
    from tsdb_parquet_spark.streaming.commitlog import (
        latest_manifest,
        read_manifest_view,
        upsert_latest_sink_manifest,
    )

    path = str(tmp_path / "mview")
    sink = upsert_latest_sink_manifest(path, ["k"], "ver", "payload", n_buckets=4)
    df1 = spark.createDataFrame(
        [(k, 1, f"v1_{k}") for k in range(8)], "k long, ver long, payload string"
    )
    sink(df1, 0)
    want1 = sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    )

    # (a) orphan generation: simulate a crash after the data write but
    # before the commit — write a generation dir by hand, no manifest
    os.makedirs(os.path.join(path, "data", "borphan-deadbeef", "__kb=0"))
    assert sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    ) == want1
    # replay of the "crashed" batch converges
    df2 = spark.createDataFrame(
        [(3, 2, "v2_3")], "k long, ver long, payload string"
    )
    sink(df2, 1)
    v, _ = latest_manifest(spark, path)
    assert v == 2

    # (b) torn manifest: half-written JSON at the next version
    with open(os.path.join(path, "_commits", f"{3:020d}.json"), "w") as fh:
        fh.write('{"version": 3, "buckets": {"0": "data/')
    got = {
        r["k"]: r["payload"] for r in read_manifest_view(spark, path).collect()
    }
    assert got[3] == "v2_3" and len(got) == 8  # fell back to version 2
    # and the full history still equals the batch oracle
    all_rows = df1.unionByName(df2)
    want = sorted(
        tuple(r)
        for r in latest_by_key(all_rows, ["k"], "ver", "payload").collect()
    )
    assert sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    ) == want

    # (c) the torn file at version 3 must NOT wedge the writer: the
    # next commit allocates PAST every existing manifest file (v4),
    # instead of retrying the exclusive create against the torn v3
    df3 = spark.createDataFrame(
        [(5, 3, "v3_5")], "k long, ver long, payload string"
    )
    sink(df3, 2)
    v_after, _ = latest_manifest(spark, path)
    assert v_after == 4
    got = {
        r["k"]: r["payload"] for r in read_manifest_view(spark, path).collect()
    }
    assert got[5] == "v3_5" and got[3] == "v2_3" and len(got) == 8


def test_manifest_vacuum_keeps_reader_window(spark, tmp_path):
    """Vacuum drops manifests past the kept tail and every generation
    dir none of them references; a reader pinned to the newest-kept
    version still scans successfully afterwards."""
    import glob
    import os

    from tsdb_parquet_spark.streaming.commitlog import (
        latest_manifest,
        read_manifest_view,
        upsert_latest_sink_manifest,
        vacuum_manifest_view,
    )

    path = str(tmp_path / "mview")
    sink = upsert_latest_sink_manifest(path, ["k"], "ver", "payload", n_buckets=2)
    for v in range(1, 5):
        df = spark.createDataFrame(
            [(k, v, f"v{v}_{k}") for k in range(4)],
            "k long, ver long, payload string",
        )
        sink(df, v)
    assert latest_manifest(spark, path)[0] == 4
    n_gens_before = len(glob.glob(os.path.join(path, "data", "*")))
    assert n_gens_before == 4

    stats = vacuum_manifest_view(spark, path, keep_manifests=2)
    assert stats["manifests_dropped"] == 2
    assert stats["generations_dropped"] >= 1
    # newest two manifests survive; the view still reads fine
    assert latest_manifest(spark, path)[0] == 4
    got = {
        r["k"]: r["payload"] for r in read_manifest_view(spark, path).collect()
    }
    assert got == {k: f"v4_{k}" for k in range(4)}


def test_manifest_compaction_is_a_commit(spark, tmp_path):
    """Compaction of a manifest view is just another commit: small
    files coalesce into a fresh generation, the result is unchanged,
    NO rename happens (old generation files still on disk until
    vacuum), and a subsequent vacuum reclaims the superseded dirs."""
    import glob
    import os

    from tsdb_parquet_spark.streaming.commitlog import (
        compact_manifest_view,
        latest_manifest,
        read_manifest_view,
        upsert_latest_sink_manifest,
        vacuum_manifest_view,
    )

    path = str(tmp_path / "mview")
    sink = upsert_latest_sink_manifest(path, ["k"], "ver", "payload", n_buckets=2)
    df = spark.createDataFrame(
        [(k, 1, f"v1_{k}") for k in range(8)], "k long, ver long, payload string"
    )
    sink(df, 0)
    before = sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    )
    v_before, m_before = latest_manifest(spark, path)
    old_files = set(glob.glob(os.path.join(path, "data", "*", "*", "*.parquet")))

    rewritten = compact_manifest_view(spark, path, min_files=1)
    assert sorted(rewritten) == ["0", "1"]
    v_after, m_after = latest_manifest(spark, path)
    assert v_after == v_before + 1
    assert all(m_after[k] != m_before[k] for k in rewritten)
    # no renames: every pre-compaction file still exists
    assert all(os.path.exists(f) for f in old_files)
    # result identical
    assert sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    ) == before
    # vacuum with keep=1 reclaims the superseded generation
    stats = vacuum_manifest_view(spark, path, keep_manifests=1)
    assert stats["generations_dropped"] >= 1
    assert sorted(
        tuple(r) for r in
        read_manifest_view(spark, path).select("k", "ver", "payload").collect()
    ) == before


def test_manifest_time_travel_and_schema_evolution(spark, tmp_path):
    """Manifests are full snapshots, so any retained version
    reconstructs with one scan (time travel); a later batch adding a
    column reads back with mergeSchema (older generations NULL-fill),
    and vacuuming past a version makes its read raise."""
    import pytest as _pytest

    from tsdb_parquet_spark.streaming.commitlog import (
        read_manifest_view,
        upsert_latest_sink_manifest,
        vacuum_manifest_view,
    )

    path = str(tmp_path / "mview")
    sink = upsert_latest_sink_manifest(path, ["k"], "ver", "payload", n_buckets=2)
    sink(spark.createDataFrame(
        [(k, 1, f"v1_{k}") for k in range(4)],
        "k long, ver long, payload string"), 0)
    sink(spark.createDataFrame(
        [(0, 2, "v2_0")], "k long, ver long, payload string"), 1)

    # time travel: version 1 predates the k=0 update
    v1 = {r["k"]: r["payload"]
          for r in read_manifest_view(spark, path, version=1).collect()}
    v2 = {r["k"]: r["payload"]
          for r in read_manifest_view(spark, path, version=2).collect()}
    assert v1[0] == "v1_0" and v2[0] == "v2_0"
    assert read_manifest_view(spark, path).count() == 4

    # schema evolution: batch 3 adds a column
    wide = spark.createDataFrame(
        [(1, 3, "v3_1", "en")], "k long, ver long, payload string, lang string"
    )
    sink3 = upsert_latest_sink_manifest(
        path, ["k"], "ver", "payload", n_buckets=2
    )
    sink3(wide, 2)
    got = {r["k"]: (r["payload"], r["lang"]) for r in read_manifest_view(
        spark, path, merge_schema=True).collect()}
    assert got[1] == ("v3_1", "en")
    assert got[2][1] is None  # older generation NULL-fills the new col

    # vacuum past version 1 -> its read raises; latest still fine
    vacuum_manifest_view(spark, path, keep_manifests=1)
    with _pytest.raises(FileNotFoundError):
        read_manifest_view(spark, path, version=1)
    assert read_manifest_view(spark, path, merge_schema=True).count() == 4
