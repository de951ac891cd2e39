"""Round-9 operators: hand-computed fixtures for the TF-IDF top-terms,
lexical stats, dedup-keep-best, length bins, seasonal anomalies, and
session co-occurrence families (entries q129-q134)."""

from __future__ import annotations

import math
import sys
from datetime import datetime
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_lexical_stats_hand_corpus(spark):
    from tsdb_parquet_spark.llm.text import lexical_stats

    docs = spark.createDataFrame(
        [
            (1, "a a b", "s1"),
            (2, "a c", "s1"),
            (3, "x y", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in lexical_stats(docs).collect()}
    # s1: tokens a,a,b,a,c -> n=5, vocab=3 (a,b,c), hapax=2 (b,c),
    # top token a with 3
    assert got["s1"].n_tokens == 5 and got["s1"].vocab == 3
    assert got["s1"].hapax == 2
    assert got["s1"].ttr == round(3 / 5, 6)
    assert got["s1"].top_share == round(3 / 5, 6)
    # s2: all hapax
    assert got["s2"].n_tokens == 2 and got["s2"].hapax == 2
    assert got["s2"].ttr == 1.0 and got["s2"].top_share == 0.5


def test_tfidf_top_terms_ranking_and_fixed_point(spark):
    from tsdb_parquet_spark.llm.text import tfidf_top_terms

    # 2 groups; "shared" in both (idf=ln(1)=0), "only1" in s1 twice
    docs = spark.createDataFrame(
        [
            (1, "shared only1 only1", "s1"),
            (2, "shared only2", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = tfidf_top_terms(docs, k=5)
    rows = {(r.source, r.term): r for r in out.collect()}
    li = round(math.log(2.0) * 1_000_000)  # idf fixed-point for gdf=1
    assert rows[("s1", "only1")].tf == 2
    assert rows[("s1", "only1")].tfidf == round(2 * li / 1e6, 6)
    assert rows[("s1", "shared")].tfidf == 0.0  # ln(2/2) = 0
    # rank: only1 (positive score) before shared (0)
    r1 = {r.term: r.rank for r in out.filter(F.col("source") == "s1").collect()}
    assert r1["only1"] == 1 and r1["shared"] == 2


def test_dedup_keep_best_quality_and_ties(spark):
    from tsdb_parquet_spark.llm.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [
            (1, "same text", 9),
            (2, "same text", 20),   # highest quality -> keeper
            (3, "same text", 20),   # quality tie -> lower id (2) wins
            (4, "unique", 5),
        ],
        "doc_id long, text string, n_chars long",
    )
    got = {r.doc_id: r for r in
           dedup_keep_best(docs, quality_col="n_chars").collect()}
    assert set(got) == {1, 3}  # keeper 2 and singleton 4 not emitted
    assert got[1].keep_id == 2 and got[3].keep_id == 2
    assert got[1].cluster_size == 3

    # default policy: lowest id keeps
    got2 = {r.doc_id: r.keep_id for r in dedup_keep_best(docs).collect()}
    assert got2 == {2: 1, 3: 1}

    # prefix clustering groups shared prefixes
    docs3 = spark.createDataFrame(
        [(1, "PREFIX tail one", 1), (2, "PREFIX tail two longer", 2)],
        "doc_id long, text string, n_chars long",
    )
    got3 = dedup_keep_best(docs3, quality_col="n_chars",
                           prefix_chars=6).collect()
    assert [(r.doc_id, r.keep_id) for r in got3] == [(1, 2)]


def test_length_quantile_bins_hand_cutoffs(spark):
    from tsdb_parquet_spark.llm.corpus import length_quantile_bins

    # lengths 1..8, one source: cuts (smallest v with cum >= p%):
    # p25 -> 2, p50 -> 4, p75 -> 6; bins: {1,2}=1 {3,4}=2 {5,6}=3 {7,8}=4
    docs = spark.createDataFrame(
        [(i, "s", i) for i in range(1, 9)],
        "doc_id long, source string, n_chars long",
    )
    got = {r.bin: r for r in length_quantile_bins(docs).collect()}
    assert {b: (got[b].n_docs, got[b].min_len, got[b].max_len)
            for b in sorted(got)} == {
        1: (2, 1, 2), 2: (2, 3, 4), 3: (2, 5, 6), 4: (2, 7, 8)}


def test_seasonal_anomalies_flags_only_cross_slot_outlier(spark):
    from tsdb_parquet_spark.operators.seasonal import (
        seasonal_anomalies,
        seasonal_baseline,
    )

    def t(h, mi):
        return datetime(2024, 1, 1, h, mi)

    # hour 0 baseline ~10 with one 100 outlier; hour 1 all 100 so a 100
    # at hour 1 is NORMAL -- the segmentation point
    rows = (
        [(i, t(0, i), "a", 10.0 + (i % 3)) for i in range(20)]
        + [(99, t(0, 40), "a", 100.0)]
        + [(200 + i, t(1, i), "a", 100.0 + (i % 2)) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = seasonal_anomalies(df, z_threshold=3.0)
    ids = [r.event_id for r in got.collect()]
    assert ids == [99]
    base = {r.slot: r for r in seasonal_baseline(df).collect()}
    # exact moments: hour-1 mean over 100,101 alternating (5 each)
    assert base[1]["_mean"] == 100.5
    # zero-variance slot cannot flag (guarded division)
    const = spark.createDataFrame(
        [(i, t(2, i), "b", 5.0) for i in range(5)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    assert seasonal_anomalies(const).count() == 0


def test_session_cooccurrence_support_and_lift(spark):
    from tsdb_parquet_spark.operators.windows import session_cooccurrence

    def t(h, mi):
        return datetime(2024, 1, 1, h, mi)

    # u1 s1: {view, click}; u1 s2 (gap > 30min): {view}; u2 s1: {view,
    # click, buy} -> sessions N=3; n(view)=3 n(click)=2 n(buy)=1
    # pairs: (click,view)=2, (buy,click)=1, (buy,view)=1
    rows = [
        (1, 1, t(0, 0), "view"), (1, 2, t(0, 5), "click"),
        (1, 3, t(2, 0), "view"),
        (2, 4, t(0, 0), "view"), (2, 5, t(0, 1), "click"),
        (2, 6, t(0, 2), "buy"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {(r.a, r.b): r for r in
           session_cooccurrence(df, "user_id", "ts", "event_id",
                                "event_type").collect()}
    assert got[("click", "view")].n_ab == 2
    assert got[("click", "view")].support == round(2 / 3, 6)
    # lift(click,view) = (2*3)/(2*3) = 1.0
    assert got[("click", "view")].lift == 1.0
    # lift(buy,click) = (1*3)/(1*2) = 1.5
    assert got[("buy", "click")].lift == 1.5
    assert set(got) == {("click", "view"), ("buy", "click"), ("buy", "view")}

    # the result must be a composable LAZY plan over the session table,
    # not a driver-materialized local relation (r9 collect round-trip) —
    # and the pair type must follow the input column's type
    out = session_cooccurrence(df, "user_id", "ts", "event_id", "event_type")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan and "LocalTableScan" not in plan
    num = session_cooccurrence(
        df.withColumn("event_type", F.crc32("event_type")),
        "user_id", "ts", "event_id", "event_type",
    )
    assert dict(num.dtypes)["a"] == "bigint"


def test_bigram_logprob_hand_corpus(spark):
    from tsdb_parquet_spark.llm.text import bigram_logprob

    # corpus bigrams: "a b" x2 (doc1), "b a" x1, "a b" (doc2) -> "a b":3?
    # doc1: a b a b -> (a b),(b a),(a b); doc2: a b -> (a b)
    # c("a b")=3, c("b a")=1; prefixes: a->3, b->1
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_logprob(docs, vocab_size=10).collect()}
    li_ab = round(math.log(3 / 3) * 1e6)  # 0
    li_ba = round(math.log(1 / 1) * 1e6)  # 0
    assert got[1].n_bigrams == 3
    assert got[1].sum_llu == 2 * li_ab + li_ba == 0
    assert got[1].lp2_tok == 0.0
    assert got[2].n_bigrams == 1
    assert 3 not in got  # single-token doc: no bigrams, no row

    # OOV floor: cap vocab to 1 -> "b a" scores the floor
    got2 = {r.doc_id: r for r in bigram_logprob(docs, vocab_size=1).collect()}
    assert got2[1].sum_llu == 2 * li_ab + (-15_000_000)


def test_centroid_drift_geometry(spark):
    from tsdb_parquet_spark.llm.similarity import centroid_drift

    # group 0 along +x, group 1 along +y -> global centroid (0.5, 0.5);
    # both groups at 45 degrees: cos = 1/sqrt(2)
    rows = [(i, [1.0, 0.0], 0) for i in range(4)] + [
        (10 + i, [0.0, 1.0], 1) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.label: r for r in centroid_drift(df).collect()}
    assert got[0].n_vectors == 4 and got[1].n_vectors == 4
    assert got[0].cos_to_global == round(1 / math.sqrt(2), 6)
    assert got[1].cos_to_global == got[0].cos_to_global
    assert got[0].centroid_norm == 1.0


def test_cli_r9_commands_smoke(spark, capsys):
    from tsdb_parquet_spark.cli import main

    main(["tfidf", "/root/testdata/sf0.001/documents.parquet",
          "--k", "2", "--limit", "4"])
    main(["lexstats", "/root/testdata/sf0.001/documents.parquet",
          "--limit", "3"])
    main(["keepbest", "/root/testdata/sf0.001/documents.parquet",
          "--quality-col", "n_chars", "--prefix-chars", "100",
          "--limit", "3"])
    out = capsys.readouterr().out
    assert "tfidf" in out and "ttr" in out and "dropped" in out


def test_dedup_keep_best_invariants_property(spark):
    """Property: for any corpus, (a) every emitted doc maps to a keeper
    in ITS OWN text cluster, (b) keepers are never emitted (remap is
    one-hop, acyclic), (c) cluster_size is the true cluster size, (d)
    emitted rows = cluster_size - 1 per non-singleton cluster, (e) with
    a quality column the keeper maximizes (quality, -id)."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tsdb_parquet_spark.llm.dedup import dedup_keep_best

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["t0", "t1", "t2", "t3"]),
                      st.integers(0, 5)),
            min_size=1, max_size=20,
        )
    )
    def run(rows):
        data = [(i, t, q) for i, (t, q) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "doc_id long, text string, n_chars long")
        got = {r.doc_id: r for r in
               dedup_keep_best(df, quality_col="n_chars").collect()}
        clusters = defaultdict(list)
        for i, t, q in data:
            clusters[t].append((i, q))
        for t, members in clusters.items():
            ids = {i for i, _ in members}
            keeper = min(members, key=lambda m: (-m[1], m[0]))[0]
            if len(members) == 1:
                assert members[0][0] not in got
                continue
            for i in ids:
                if i == keeper:
                    assert i not in got  # (b)
                else:
                    assert got[i].keep_id == keeper  # (a), (e)
                    assert got[i].cluster_size == len(members)  # (c)
            assert sum(1 for i in ids if i in got) == len(members) - 1  # (d)

    run()


def test_length_bins_partition_property(spark):
    """Property: bins partition the corpus (counts sum to total), bin
    ids are contiguous from 1, and per-bin [min,max] ranges are
    disjoint and ordered."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tsdb_parquet_spark.llm.corpus import length_quantile_bins

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(0, 1000), min_size=4, max_size=40))
    def run(lengths):
        data = [(i, "s" if i % 2 else "t", v) for i, v in enumerate(lengths)]
        df = spark.createDataFrame(
            data, "doc_id long, source string, n_chars long")
        got = length_quantile_bins(df).collect()
        assert sum(r.n_docs for r in got) == len(lengths)
        by_bin = {}
        for r in got:
            by_bin.setdefault(r.bin, []).append(r)
        assert min(by_bin) >= 1 and max(by_bin) <= 4
        spans = sorted(
            (min(r.min_len for r in rs), max(r.max_len for r in rs))
            for b, rs in sorted(by_bin.items())
        )
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2  # disjoint, ordered value ranges

    run()


def test_semdedup_numpy_pairwise_matches_hof_path(spark):
    """k > 8 switches BOTH assignment and the within-cluster pairwise
    drop to numpy; on well-separated similarities (where a last-ulp
    summation difference cannot flip the threshold) the survivor set
    must match the literal/HOF path's semantics: planted near-identical
    dups drop, separated vectors survive."""
    from tsdb_parquet_spark.llm.dedup import semdedup

    rows = []
    for i in range(40):
        v = [0.0] * 16
        v[i % 16] = 1.0
        v[(i * 5 + 3) % 16] = 0.5 if i % 3 else -0.5
        rows.append((i, v))
        if i % 4 == 0:
            rows.append((100 + i, [x * 1.0001 for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ids = {r[0] for r in rows}
    d8 = ids - {r.vec_id for r in semdedup(df, k=8, threshold=0.95).collect()}
    d9 = ids - {r.vec_id for r in semdedup(df, k=9, threshold=0.95).collect()}
    # same drops through the numpy assignment + numpy pairwise path
    assert d8 == d9
    # every planted dup dropped (its base is earlier by construction of
    # the md5 rank in at least these cases -- one of the pair must go)
    for i in range(0, 40, 4):
        assert (100 + i in d8) or (i in d8)


def test_semdedup_tiled_pairwise_matches_untiled(spark):
    """The memory-bounded tiled any-earlier check (r13 — an unchunked
    cluster^2 matrix killed the worker on duplicate-heavy sf100 data)
    must produce the same survivor set as one-tile (= full-matrix)
    evaluation, across tile boundaries."""
    from tsdb_parquet_spark.llm.dedup import semdedup

    rows = []
    for i in range(60):
        v = [0.0] * 8
        v[i % 8] = 1.0
        v[(i * 3 + 1) % 8] = 0.5 if i % 2 else -0.5
        rows.append((i, v))
        if i % 3 == 0:
            rows.append((200 + i, [x * 1.0001 for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = sorted(
        tuple(r) for r in semdedup(df, k=9, threshold=0.95,
                                   _pair_tile=4096).collect()
    )
    tiled = sorted(
        tuple(r) for r in semdedup(df, k=9, threshold=0.95,
                                   _pair_tile=7).collect()
    )
    assert full == tiled and len(full) < len(rows)


def test_temperature_mixture_weights_math(spark):
    from tsdb_parquet_spark.llm.corpus import temperature_mixture_weights

    # sources with 80/20 token split, alpha=0.5 -> p ∝ sqrt(share)
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 80), "big"), (2, " ".join(["w"] * 20), "small")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in
           temperature_mixture_weights(docs, alpha=0.5).collect()}
    import math
    pw_b, pw_s = math.sqrt(0.8), math.sqrt(0.2)
    z = pw_b + pw_s
    assert got["big"].n_tokens == 80
    assert got["big"].natural_share == round(0.8, 9)
    assert got["big"].p_temp == round(pw_b / z, 9)
    assert got["small"].upsample == round((pw_s / z) / 0.2, 6)
    # rare source boosted, common damped
    assert got["small"].upsample > 1.0 > got["big"].upsample
    # alpha=1 reproduces natural proportions
    nat = {r.source: r for r in
           temperature_mixture_weights(docs, alpha=1.0).collect()}
    assert nat["big"].p_temp == nat["big"].natural_share


def test_integrity_audit_counts_and_groups(spark):
    from tsdb_parquet_spark.llm.corpus import integrity_audit

    left = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "b")], "k long, g string"
    )
    right = spark.createDataFrame([(2,), (3,), (9,)], "k long")
    row = integrity_audit(left, right, "k", "k").first()
    # key-level: duplicate left key 1 counts once
    assert (row.matched, row.left_missing_right, row.right_orphans) == (2, 1, 1)

    by_g = {r.g: r for r in
            integrity_audit(left, right, "k", "k", group_col="g").collect()}
    assert by_g["a"].matched == 1 and by_g["a"].left_missing_right == 1
    assert by_g["b"].matched == 1
    assert by_g["__orphan_right__"].right_orphans == 1


def test_trailing_window_distinct_hand_days(spark):
    from datetime import datetime

    from tsdb_parquet_spark.operators.aggregates import (
        trailing_window_distinct,
    )

    def t(day):
        return datetime(2024, 1, 1 + day)

    # users: u1 active day 0, u2 day 0+2, u3 day 9
    rows = [(1, t(0)), (2, t(0)), (2, t(2)), (3, t(9))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.day_num: r.active for r in
           trailing_window_distinct(df, "user_id", "ts", 3).collect()}
    base = min(got)  # epoch day of 2024-01-01
    # window 3: day0 {u1,u2}=2; day1 {u1,u2}=2; day2 {u1,u2}=2 (u2 re-
    # active); day3 {u2}=1 (u1's day-0 aged out); day4 {u2}=1; day 9 {u3}
    assert got[base] == 2 and got[base + 1] == 2 and got[base + 2] == 2
    assert got[base + 3] == 1 and got[base + 4] == 1
    assert got[base + 9] == 1
    # trimmed: no day past the observed max, no empty days invented
    assert max(got) == base + 9
    assert base + 5 not in got and base + 8 not in got


def test_source_vocab_overlap_jaccard(spark):
    from tsdb_parquet_spark.llm.text import source_vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "x y", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {(r.src_a, r.src_b): r for r in source_vocab_overlap(docs).collect()}
    # s1={a,b,c}, s2={b,c,d}: shared 2, union 4 -> jaccard 0.5
    r12 = got[("s1", "s2")]
    assert (r12.shared_terms, r12.vocab_a, r12.vocab_b) == (2, 3, 3)
    assert r12.jaccard == 0.5
    # disjoint pairs produce NO row (inner join on shared terms)
    assert ("s1", "s3") not in got and ("s2", "s3") not in got


def test_pagerank_integer_reference(spark):
    """Integer PageRank matches a pure-Python replay of the exact
    integer recurrence; sink node accumulates the most rank."""
    from tsdb_parquet_spark.operators.graph import pagerank_integer

    edges = [(1, 3), (2, 3), (3, 4), (4, 3), (5, 3), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_units"]
           for r in pagerank_integer(df, iters=5).collect()}

    MASS = 10 ** 12
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    base = (3 * MASS) // (20 * n)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: MASS // n for v in nodes}
    for _ in range(5):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {v: base + (17 * s[v]) // 20 for v in nodes}
    assert got == r
    assert max(got, key=got.get) == 3


def test_pagerank_partitioning_independent(spark):
    from tsdb_parquet_spark.operators.graph import pagerank_integer

    import random
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, pagerank_integer(df, iters=4).collect()))
    b = sorted(map(tuple,
                   pagerank_integer(df.repartition(13), iters=4).collect()))
    assert a == b
