"""Sources (FASTQ/FASTA/SAM readers) and multimodal binary plumbing."""

from __future__ import annotations

import gzip

import pytest


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("fq") / "demo.fastq"
    recs = []
    for i in range(6):
        recs += [f"@read{i}/1", "ATGC" * 5, "+", "IIII" * 5]
    p.write_text("\n".join(recs) + "\n")
    return str(p)


def test_read_fastq(spark, fastq_file):
    from kneaddata_spark.sources.fastq import read_fastq

    df = read_fastq(spark, fastq_file)
    rows = df.orderBy("pos").collect()
    assert len(rows) == 6
    assert rows[0]["read_id"] == "read0/1" and rows[0]["seq"] == "ATGC" * 5
    assert rows[5]["pos"] == 5


def test_read_fastq_gzip(spark, tmp_path, fastq_file):
    from kneaddata_spark.sources.fastq import read_fastq

    gz = tmp_path / "demo.fastq.gz"
    gz.write_bytes(gzip.compress(open(fastq_file, "rb").read()))
    assert read_fastq(spark, str(gz)).count() == 6


def test_fastq_to_fasta_alphabet_filter(spark):
    from kneaddata_spark.sources.fastq import fastq_to_fasta

    rows = [("f", 0, "ok", "ATGCN", "IIIII"), ("f", 1, "bad", "ATXGC", "IIIII")]
    df = spark.createDataFrame(rows, "src string, pos long, read_id string, seq string, qual string")
    got = fastq_to_fasta(df).collect()
    assert [r["read_id"] for r in got] == ["ok"]
    assert "qual" not in got[0].asDict()


def test_sam_to_fastq_first_occurrence(spark):
    from kneaddata_spark.sources.fastq import sam_to_fastq

    rows = [
        ("r1", "AAAA", "IIII", 0),
        ("r1", "CCCC", "JJJJ", 1),  # duplicate id: must keep first
        ("r2", "GGGG", "KKKK", 2),
    ]
    df = spark.createDataFrame(rows, "read_id string, seq string, qual string, pos long")
    got = {r["read_id"]: r["seq"] for r in sam_to_fastq(df).collect()}
    assert got == {"r1": "AAAA", "r2": "GGGG"}


def test_split_mates_by_suffix(spark):
    from kneaddata_spark.sources.fastq import split_mates_by_suffix

    df = spark.createDataFrame([("x/1",), ("x/2",), ("solo",)], ["read_id"])
    got = {r["read_id"]: (r["mate"], r["read_key"]) for r in split_mates_by_suffix(df).collect()}
    assert got["x/1"] == (1, "x") and got["x/2"] == (2, "x") and got["solo"] == (None, "solo")


def test_scalars(spark):
    from pyspark.sql import functions as F

    from kneaddata_spark.functions.scalars import (
        phred33_mean,
        reverse_complement,
        sequence_alphabet_ok,
    )

    df = spark.createDataFrame([("ATCG", "II5I")], ["seq", "qual"])
    r = df.select(
        reverse_complement(F.col("seq")).alias("rc"),
        phred33_mean(F.col("qual")).alias("q"),
        sequence_alphabet_ok(F.col("seq")).alias("ok"),
    ).collect()[0]
    assert r["rc"] == "CGAT"
    # I=73 -> 40, 5=53 -> 20 ; mean of (40,40,20,40) = 35
    assert abs(r["q"] - 35.0) < 1e-9
    assert r["ok"] is True


def test_multimodal_image_features(spark):
    from kneaddata_spark.multimodal import extract_image_features

    rows = [("m1", b"\x01\x02\x03" * 100, "image/png", 10, 10), ("m2", b"zz", "image/jpeg", 2, 2)]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, mime string, width int, height int")
    out = extract_image_features(df).collect()
    byid = {r["media_id"]: r for r in out}
    assert byid["m1"]["n_bytes"] == 300 and len(byid["m1"]["feat"]) == 8
    # deterministic: same bytes -> same feature vector
    out2 = extract_image_features(df).collect()
    assert {r["media_id"]: list(r["feat"]) for r in out2} == {
        r["media_id"]: list(r["feat"]) for r in out
    }


def test_multimodal_strict_raises(spark):
    import pytest as _pytest

    from kneaddata_spark.multimodal import extract_image_features

    df = spark.createDataFrame(
        [("m1", b"x", "image/png", 1, 1)],
        "media_id string, bytes binary, mime string, width int, height int",
    )
    with _pytest.raises(Exception, match="NotImplementedError|image decode"):
        extract_image_features(df, strict=True).collect()


def test_frame_sampling_fanout(spark):
    from kneaddata_spark.multimodal import sample_frames

    df = spark.createDataFrame(
        [("v1", bytes(range(256)) * 20, "video/mp4", 0, 0)],
        "media_id string, bytes binary, mime string, width int, height int",
    )
    frames = sample_frames(df, every_n_bytes=1024).collect()
    assert len(frames) == 5  # 5120 bytes -> 5 frames
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2, 3, 4]


def test_write_fastq_golden_roundtrip(spark, tmp_path, fastq_file):
    """Golden-file parity (reference basic_tests.py:94-108 filecmp):
    read_fastq -> write_fastq must reproduce the input BYTE-EXACTLY."""
    from kneaddata_spark.sources.fastq import read_fastq, write_fastq

    df = read_fastq(spark, fastq_file)
    out = write_fastq(df, str(tmp_path / "emit"), single_file=True)
    assert open(out, "rb").read() == open(fastq_file, "rb").read()


def test_write_fastq_sam_pipeline_golden(spark, tmp_path):
    """sam_to_fastq -> write_fastq golden: first occurrence per id, input
    order — the reference's sam-to-fastq byte comparison, multi-partition."""
    from kneaddata_spark.sources.fastq import sam_to_fastq, write_fastq

    rows = []
    for i in range(50):
        rid = f"r{i % 20}"  # ids repeat: only first occurrence survives
        rows.append((rid, "ACGT" + str(i % 20), "IIII" + str(i % 20), i))
    sam = spark.createDataFrame(rows, "read_id string, seq string, qual string, pos bigint").repartition(7)
    fq = sam_to_fastq(sam, keep_pos=True)
    out = write_fastq(fq, str(tmp_path / "sam_emit"), order_cols=("pos",), single_file=True)
    want = "".join(f"@r{i}\nACGT{i}\n+\nIIII{i}\n" for i in range(20))
    assert open(out).read() == want
