"""Prometheus TSDB block reader (R1-R3 parity) — decode the reference's own
committed block (`/root/reference/01GW1T7K3E9F9R361GDPVH8NZF`) and check the
result against the block's meta.json, which the reference itself trusts
(hello.go:50-74 openBlock, hello.go:480-510 sample loop)."""

from __future__ import annotations

import os

import pytest

from tsdb_parquet_spark import tsdb_block as tb

BLOCK = "/root/reference/01GW1T7K3E9F9R361GDPVH8NZF"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BLOCK), reason="reference block not present"
)


def test_crc32c_known_vector():
    # the Castagnoli check value from the CRC catalogue
    assert tb.crc32c(b"123456789") == 0xE3069283


def test_read_index_counts_and_labels():
    series = tb.read_index(os.path.join(BLOCK, "index"))
    meta = tb.block_meta(BLOCK)
    assert len(series) == meta["stats"]["numSeries"] == 767
    assert sum(len(s.chunk_refs) for s in series) == meta["stats"]["numChunks"]
    # every series carries the scrape-target labels
    for s in series:
        assert "__name__" in s.labels
        assert s.labels.get("job") == "prometheus"


def test_decode_matches_meta_json():
    meta = tb.block_meta(BLOCK)
    n_samples = 0
    tmin, tmax = None, None
    for _labels, samples in tb.read_block(BLOCK):
        n_samples += len(samples)
        for t, _ in samples:
            tmin = t if tmin is None else min(tmin, t)
            tmax = t if tmax is None else max(tmax, t)
    assert n_samples == meta["stats"]["numSamples"] == 154529
    assert tmin == meta["minTime"]
    # maxTime in meta.json is exclusive (rounded up to the block boundary)
    assert tmax < meta["maxTime"]
    assert tmax >= meta["maxTime"] - 15_000  # within one scrape interval


def test_up_series_is_reference_query_target():
    # hello.go:517's exact matchers: up{instance="localhost:9090",job="prometheus"}
    ups = [
        s
        for l, s in tb.read_block(BLOCK)
        if l.get("__name__") == "up"
        and l.get("instance") == "localhost:9090"
        and l.get("job") == "prometheus"
    ]
    assert len(ups) == 1
    samples = ups[0]
    assert all(v in (0.0, 1.0) for _, v in samples)  # `up` is a 0/1 gauge
    ts = [t for t, _ in samples]
    assert ts == sorted(ts)


def test_chunk_crc_detected(tmp_path):
    # corrupt one byte of the chunks segment -> CRC must fail loudly
    import shutil

    dst = tmp_path / "block"
    shutil.copytree(BLOCK, dst)
    seg = dst / "chunks" / "000001"
    os.chmod(seg, 0o644)
    data = bytearray(seg.read_bytes())
    data[100] ^= 0xFF
    seg.write_bytes(data)
    with pytest.raises(ValueError, match="CRC"):
        for _ in tb.read_block(str(dst)):
            pass


def test_ingest_block_roundtrip(spark, tmp_path):
    out = str(tmp_path / "block_pq")
    n = tb.ingest_block(spark, BLOCK, out, num_files=2)
    assert n == 154529
    df = spark.read.parquet(out)
    assert df.count() == 154529
    # the reference's literal query shape works on the ingested table
    got = (
        df.filter(
            (df.label_name == "up")
            & (df.label_instance == "localhost:9090")
            & (df.label_job == "prometheus")
        ).count()
    )
    assert got == 209


def test_ingest_blocks_distributed(spark, tmp_path):
    # two copies of the same block through the mapInPandas fan-out path:
    # per-block tasks, union schema, 2x the samples
    out = str(tmp_path / "blocks_pq")
    n = tb.ingest_blocks(spark, [BLOCK, BLOCK], out, num_files=2)
    assert n == 2 * 154529


def test_committed_fixture_matches_block():
    # data/tsdb_block is the committed ingest artifact q56 queries; it must
    # stay in sync with the block bytes
    import duckdb

    path = "/root/repo/data/tsdb_block"
    if not os.path.isdir(path):
        pytest.skip("committed ingest artifact absent")
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}/part-*.parquet')"
    ).fetchone()[0]
    assert n == 154529


def test_block_writer_reader_roundtrip(tmp_path):
    # random-walk series with counter resets, negative dods, repeated
    # values: exercises every XOR/dod encoding branch
    import random

    rnd = random.Random(13)
    series = []
    for s in range(20):
        t = 1_600_000_000_000 + rnd.randint(0, 5000)
        v = float(rnd.randint(0, 100))
        samples = []
        for _ in range(rnd.randint(1, 300)):
            samples.append((t, v))
            t += rnd.choice([15_000, 15_007, 14_993, 60_000, 1])
            r = rnd.random()
            if r < 0.3:
                pass  # repeated value
            elif r < 0.9:
                v += rnd.choice([1.0, -1.0, 0.5, 1e-9, 1e9])
            else:
                v = 0.0  # counter reset
        series.append(({"__name__": f"m{s}", "instance": f"i{s % 3}"}, samples))

    blk = str(tmp_path / "synth_block")
    tb.write_block(blk, series)
    got = {tuple(sorted(l.items())): s for l, s in tb.read_block(blk)}
    for labels, samples in series:
        key = tuple(sorted(labels.items()))
        assert got[key] == sorted(samples), f"mismatch for {labels}"
    meta = tb.block_meta(blk)
    assert meta["stats"]["numSeries"] == 20


def test_xor_chunk_encoder_edge_values():
    cases = [
        [],
        [(0, 1.5)],
        [(0, 0.0), (1, 0.0)],
        [(0, float("inf")), (15_000, float("-inf")), (30_000, 1e-300)],
        [(0, 1.0), (1 << 40, 2.0)],  # 64-bit dod path
        [(0, -0.0), (10, 0.0), (20, -0.0)],
    ]
    for samples in cases:
        assert tb.decode_xor_chunk(tb.encode_xor_chunk(samples)) == samples


def test_xor_chunk_roundtrip_property():
    """Property: decode(encode(s)) == s for ANY sorted sample run —
    arbitrary time gaps (delta-of-delta buckets incl. the 64-bit path)
    and full-float values (subnormals, ±inf, ±0.0, huge exponents).
    NaN is excluded here only because NaN != NaN breaks the equality
    oracle; the dedicated edge test covers the engine's NaN sentinel
    handling at the ingest layer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    times = st.lists(
        st.integers(min_value=0, max_value=1 << 41), min_size=0, max_size=60,
        unique=True,
    ).map(sorted)
    value = st.floats(allow_nan=False, width=64)

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def run(data):
        ts = data.draw(times)
        vs = [data.draw(value) for _ in ts]
        samples = list(zip(ts, vs))
        out = tb.decode_xor_chunk(tb.encode_xor_chunk(samples))
        # compare bit patterns so -0.0 vs 0.0 can't false-pass
        import struct

        pack = lambda s: [(t, struct.pack(">d", v)) for t, v in s]  # noqa: E731
        assert pack(out) == pack(samples)

    run()


def test_multi_block_ingest_distinct_blocks(spark, tmp_path):
    # the reference block + a synthetic block with DIFFERENT label names:
    # union schema, both decode in executor tasks
    synth = str(tmp_path / "b2")
    tb.write_block(
        synth,
        [({"__name__": "synthetic_metric", "zone": "z1"},
          [(1679382479083 + i * 15_000, float(i)) for i in range(100)])],
    )
    out = str(tmp_path / "multi_pq")
    n = tb.ingest_blocks(spark, [BLOCK, synth], out, num_files=2)
    assert n == 154529 + 100
    df = spark.read.parquet(out)
    assert "label_zone" in df.columns and "label_handler" in df.columns
    assert df.filter(df.label_name == "synthetic_metric").count() == 100


def test_cli_ingest_tsdb_multi_block(spark, tmp_path, capsys):
    # argparse: blocks(nargs='+') followed by dest must split correctly
    from tsdb_parquet_spark.cli import main

    synth = str(tmp_path / "blk2")
    tb.write_block(
        synth,
        [({"__name__": "cli_metric", "dc": "d1"},
          [(1679382479083 + i * 1000, float(i)) for i in range(50)])],
    )
    dest = str(tmp_path / "cli_multi")
    main(["ingest-tsdb", BLOCK, synth, dest, "--files", "2"])
    out = capsys.readouterr().out
    assert f"{154529 + 50} rows" in out
    assert spark.read.parquet(dest).count() == 154529 + 50
