"""WebDataset tar shard sink: assignment arithmetic, byte-exact member
round-trip, rerun determinism (sha256 receipts), and binary payloads."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark, n=200):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang")
        .where(F.col("doc_id") < n)
    )


def test_shard_plan_contiguous_chunks(spark):
    from kneaddata_spark.sources.webdataset import shard_plan

    planned = shard_plan(_docs(spark), "doc_id", samples_per_shard=16)
    rows = sorted(
        planned.select("doc_id", "shard", "pos").collect(), key=lambda r: r.doc_id
    )
    # key order maps to (rank div n, rank mod n) exactly
    for rank, r in enumerate(rows):
        assert (r.shard, r.pos) == (rank // 16, rank % 16), r


def test_manifest_matches_written_receipts(spark, tmp_path):
    from kneaddata_spark.sources.webdataset import (
        shard_manifest,
        shard_plan,
        write_shards,
    )

    d = _docs(spark)
    man = {
        r.shard: r
        for r in shard_manifest(d, "doc_id", "text", samples_per_shard=32).collect()
    }
    planned = shard_plan(d, "doc_id", samples_per_shard=32)
    receipts = write_shards(
        planned, str(tmp_path / "wds"), "doc_id", "text", meta_cols=("lang",)
    ).collect()
    assert {r.shard for r in receipts} == set(man)
    for r in receipts:
        assert r.n_samples == man[r.shard].n_samples
        assert os.path.getsize(r.path) == r.tar_bytes
    # every shard except the last holds exactly 32 samples
    n_docs = d.count()
    full, last = divmod(n_docs, 32)
    sizes = {r.shard: r.n_samples for r in receipts}
    for s, n in sizes.items():
        assert n == (32 if s < full else last)


def test_members_byte_exact_and_ordered(spark, tmp_path):
    from kneaddata_spark.sources.webdataset import shard_plan, write_shards

    d = _docs(spark, n=70)
    expected = {r.doc_id: (r.text, r.lang) for r in d.collect()}
    planned = shard_plan(d, "doc_id", samples_per_shard=20)
    receipts = write_shards(
        planned, str(tmp_path / "wds"), "doc_id", "text", meta_cols=("lang",)
    ).collect()
    seen = {}
    for rec in receipts:
        with tarfile.open(rec.path) as tf:
            names = tf.getnames()
            # members come in (payload, json) pairs, keys in pos order
            assert len(names) == 2 * rec.n_samples
            keys = []
            for i in range(0, len(names), 2):
                base, ext = names[i].rsplit(".", 1)
                assert ext == "txt" and names[i + 1] == f"{base}.json"
                keys.append(int(base))
                payload = tf.extractfile(names[i]).read()
                meta = json.loads(tf.extractfile(names[i + 1]).read())
                text, lang = expected[int(base)]
                assert payload == text.encode("utf-8")
                assert meta == {"doc_id": int(base), "lang": lang}
            assert keys == sorted(keys)
            seen.update({k: rec.shard for k in keys})
    # every input doc landed in exactly one shard, chunked by key order
    assert set(seen) == set(expected)
    ordered = sorted(seen)
    for rank, k in enumerate(ordered):
        assert seen[k] == rank // 20


def test_rerun_produces_identical_tar_bytes(spark, tmp_path):
    from kneaddata_spark.sources.webdataset import shard_plan, write_shards

    d = _docs(spark, n=90)
    planned = shard_plan(d, "doc_id", samples_per_shard=25)
    h1 = {
        r.shard: r.sha256
        for r in write_shards(planned, str(tmp_path / "a"), "doc_id", "text").collect()
    }
    h2 = {
        r.shard: r.sha256
        for r in write_shards(planned, str(tmp_path / "b"), "doc_id", "text").collect()
    }
    assert h1 == h2
    # receipt hash is the real file hash (headers normalized: mtime=0 etc.)
    for r in write_shards(planned, str(tmp_path / "c"), "doc_id", "text").collect():
        with open(r.path, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == r.sha256


def test_binary_payloads_roundtrip(spark, tmp_path):
    from kneaddata_spark.sources.webdataset import shard_plan, write_shards
    from kneaddata_spark.synth import gen_clips_pdf

    pdf = gen_clips_pdf(24)[["clip_id", "bytes", "codec"]]
    clips = spark.createDataFrame(pdf)
    expected = {r["clip_id"]: bytes(r["bytes"]) for _, r in pdf.iterrows()}
    planned = shard_plan(clips, "clip_id", samples_per_shard=10)
    receipts = write_shards(
        planned,
        str(tmp_path / "wds"),
        "clip_id",
        "bytes",
        payload_ext="bin",
        meta_cols=("codec",),
    ).collect()
    got = {}
    for rec in receipts:
        with tarfile.open(rec.path) as tf:
            for name in tf.getnames():
                if name.endswith(".bin"):
                    got[name[: -len(".bin")]] = tf.extractfile(name).read()
    assert got == expected


def test_shard_plan_rejects_bad_chunk(spark):
    from kneaddata_spark.sources.webdataset import shard_plan

    with pytest.raises(ValueError):
        shard_plan(_docs(spark), "doc_id", samples_per_shard=0)


def test_stream_shards_equal_batch_and_idempotent(spark, tmp_path):
    """Streaming shard sink == per-batch write_shards, byte-for-byte: two
    files processed one per trigger; every batch's streamed tars must
    carry the same sha256 set as running the batch operator on that
    file's rows alone, and a re-trigger on the same checkpoint must leave
    every tar byte-identical (receipts prove it — the sink's idempotency
    is byte-grade, not just overwrite-grade)."""
    import glob
    import shutil
    import time

    from kneaddata_spark.sources.webdataset import shard_plan, write_shards
    from kneaddata_spark.streaming.shard_stream import stream_webdataset

    src = str(tmp_path / "in")
    out = str(tmp_path / "shards")
    rec = str(tmp_path / "receipts")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [(f"a{i:03d}", f"alpha document {i} " + "x" * (i % 7)) for i in range(45)],
        [(f"b{i:03d}", f"beta document {i}") for i in range(23)],
    ]

    def stage(rows, name):
        tmp = src + "_stage_" + name
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        os.makedirs(src, exist_ok=True)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], os.path.join(src, name))

    stage(batches[0], "f0.parquet")
    q = stream_webdataset(spark, src, out, rec, ckpt, samples_per_shard=20,
                          max_files_per_trigger=1)
    q.awaitTermination(180)
    stage(batches[1], "f1.parquet")
    time.sleep(0.2)
    q = stream_webdataset(spark, src, out, rec, ckpt, samples_per_shard=20,
                          max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {
        (r.batch_id, r.shard): (r.n_samples, r.sha256)
        for r in spark.read.parquet(rec).collect()
    }
    # batch replica: write_shards per file into a fresh dir
    want = {}
    for bid, rows in enumerate(batches):
        d = spark.createDataFrame(rows, "doc_id string, text string")
        rep = write_shards(
            shard_plan(d, "doc_id", 20), str(tmp_path / f"ref{bid}"),
            "doc_id", "text",
        ).collect()
        for r in rep:
            want[(bid, r.shard)] = (r.n_samples, r.sha256)
    assert got == want

    # re-trigger: no new input -> receipts unchanged, tar files unchanged
    hashes_before = {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out, "batch_id=*", "*.tar"))
    }
    assert len(hashes_before) == len(want)
    q = stream_webdataset(spark, src, out, rec, ckpt, samples_per_shard=20,
                          max_files_per_trigger=1)
    q.awaitTermination(120)
    hashes_after = {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out, "batch_id=*", "*.tar"))
    }
    assert hashes_after == hashes_before


def test_read_shards_roundtrip(spark, tmp_path):
    """engine -> write_shards -> read_shards == the original corpus:
    byte-exact payloads, keys, shard assignment, canonical meta; torn
    shards fail loudly."""
    import json

    from kneaddata_spark.sources.webdataset import (
        read_shards,
        shard_plan,
        write_shards,
    )

    d = spark.createDataFrame(
        [(i, f"text body {i} é", f"lang{i % 3}") for i in range(57)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "shards")
    write_shards(shard_plan(d, "doc_id", 20), out, "doc_id", "text",
                 meta_cols=("lang",)).collect()
    back = read_shards(spark, out).collect()
    assert len(back) == 57
    want = {str(r["doc_id"]): r for r in d.collect()}
    for r in back:
        w = want[r["key"]]
        assert bytes(r["payload"]).decode("utf-8") == w["text"]
        meta = json.loads(r["meta"])
        assert meta["lang"] == w["lang"] and meta["doc_id"] == w["doc_id"]
        assert r["shard"] == w["doc_id"] // 20  # contiguous key-order chunks
    # torn shard: truncate one tar mid-member -> loud failure
    import glob
    import os

    victim = sorted(glob.glob(os.path.join(out, "*.tar")))[0]
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[: len(blob) // 2])
    import pytest

    with pytest.raises(Exception):
        read_shards(spark, out).collect()
