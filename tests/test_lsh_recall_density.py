"""LSH recall at realistic duplicate density (SURVEY §7.1 M3, round-4).

The 100 TB dedup claim needs a quality number, not just a plan shape: a
~5k-doc corpus with PLANTED near-duplicates at known similarity levels,
and measured recall@threshold for each candidate generator against the
exact ground truth on the planted pairs.  Floors pinned here are the
numbers the module docstrings advertise.

Ground truth is exact by construction: random 40-token docs from a
200-word vocabulary are pairwise-dissimilar with overwhelming probability,
so the true near-dup set is exactly the planted pairs that clear the
similarity threshold (verified in Python per pair — 500 cheap set ops).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from tsdb_parquet_spark.llm import dedup as llm

N_BASE = 5000
N_DUP = 500
VOCAB = [f"w{i:03d}" for i in range(200)]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(7)
    base = {}
    for i in range(N_BASE):
        base[i] = " ".join(VOCAB[j] for j in rng.randint(0, len(VOCAB), 40))
    planted = {}
    for i in range(N_DUP):
        toks = base[i].split()
        n_edits = 1 + i % 5  # 1..5 token substitutions -> graded Jaccard
        for k in range(n_edits):
            toks[(7 * k + i) % len(toks)] = VOCAB[(i + k * 13) % len(VOCAB)]
        planted[N_BASE + i] = " ".join(toks)
    return base, planted


def _shingles(t: str, n: int = 5) -> set[str]:
    return {t[k : k + n] for k in range(len(t) - n + 1)}


def test_minhash_recall_at_density(spark, corpus):
    base, planted = corpus
    true_pairs = set()
    for j, text in planted.items():
        i = j - N_BASE
        sa, sb = _shingles(base[i]), _shingles(text)
        jac = len(sa & sb) / len(sa | sb)
        if jac >= 0.8:
            true_pairs.add((i, j))
    # graded edits mean a healthy band straddles the threshold
    assert 150 <= len(true_pairs) <= 450

    docs = spark.createDataFrame(
        list(base.items()) + list(planted.items()), "doc_id long, text string"
    ).repartition(8)
    sigs = llm.minhash_signatures(docs, num_hashes=64, shingle_n=5)
    cand = llm.minhash_lsh_candidates(sigs, bands=16)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    recall = len(true_pairs & got) / len(true_pairs)
    print(f"minhash recall@J>=0.8: {recall:.3f} over {len(true_pairs)} true pairs, "
          f"{len(got)} candidates from {N_BASE + N_DUP} docs")
    assert recall >= 0.9, f"minhash recall {recall}"
    # candidate volume stays LSH-sized, not all-pairs (~15M)
    assert len(got) < 50_000


def test_simhash_recall_is_exact_within_radius(spark, corpus):
    base, planted = corpus
    docs = spark.createDataFrame(
        list(base.items()) + list(planted.items()), "doc_id long, text string"
    ).repartition(8)
    sigs_df = llm.simhash_signatures(docs)
    sigs = {r["doc_id"]: r["simhash"] for r in sigs_df.collect()}
    true_pairs = set()
    for j in planted:
        i = j - N_BASE
        ham = bin((sigs[i] ^ sigs[j]) & (2**64 - 1)).count("1")
        if ham <= 3:
            true_pairs.add((i, j))
    assert len(true_pairs) >= 50  # low-edit plants land within radius 3

    got = {
        (r["id_a"], r["id_b"])
        for r in llm.simhash_neardup_pairs(sigs_df, max_hamming=3).collect()
    }
    recall = len(true_pairs & got) / len(true_pairs)
    print(f"simhash recall@ham<=3: {recall:.3f} over {len(true_pairs)} true pairs")
    # 4x16-bit block LSH is pigeonhole-EXACT for radius 3: recall must be 1
    assert recall == 1.0


def test_srp_multi_table_recall(spark, corpus):
    rng = np.random.RandomState(11)
    vecs = {i: v / np.linalg.norm(v)
            for i, v in enumerate(rng.standard_normal((N_BASE, 32)))}
    true_pairs = set()
    for i in range(250):
        noise = rng.standard_normal(32) * 0.02  # ||noise||~0.11 -> cos ~0.994
        v = vecs[i] + noise
        v = v / np.linalg.norm(v)
        vecs[N_BASE + i] = v
        if float(np.dot(vecs[i], v)) >= 0.98:
            true_pairs.add((i, N_BASE + i))
    assert len(true_pairs) >= 200

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    got = {
        (r["id_a"], r["id_b"])
        for r in llm.embedding_neardup_pairs(
            df, threshold=0.98, num_planes=8, num_tables=4
        ).collect()
    }
    recall = len(true_pairs & got) / len(true_pairs)
    print(f"srp recall@cos>=0.98 (8 planes x 4 tables): {recall:.3f} "
          f"over {len(true_pairs)} true pairs")
    # theory: p=(1-theta/pi)^8 ~ 0.59/table at cos .98; 1-(1-p)^4 ~ 0.97
    assert recall >= 0.9
