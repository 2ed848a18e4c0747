"""Determinism + unit behavior of the generator and model artifacts."""

from __future__ import annotations

import numpy as np

from kneaddata_spark import rules
from kneaddata_spark.oracle import decode_pcm, scrub_text
from kneaddata_spark.synth import gen_clip, gen_clips_pdf


def test_generator_deterministic_and_order_independent():
    a = gen_clip(123)
    b = gen_clip(123)
    assert a == b
    pdf = gen_clips_pdf(5, start=120)
    assert pdf.iloc[3]["clip_id"] == a["clip_id"]
    assert bytes(pdf.iloc[3]["bytes"]) == a["bytes"]


def test_generator_schema():
    pdf = gen_clips_pdf(10)
    assert list(pdf.columns) == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    assert pdf["sr_hz"].dtype == np.int32 and pdf["dur_ms"].dtype == np.int32


def test_decode_roundtrip_all_codecs():
    for codec in rules.VALID_CODECS:
        import struct

        pcm = np.linspace(-0.9, 0.9, 64, dtype=np.float32)
        s16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
        if codec == "pcm_s16le":
            raw = s16.tobytes()
        elif codec == "pcm_u8":
            raw = (np.clip(np.round(pcm * 127.0) + 128, 0, 255).astype(np.uint8)).tobytes()
        elif codec == "wav":
            payload = s16.tobytes()
            raw = (
                b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
                + b"data" + struct.pack("<I", len(payload)) + payload
            )
        elif codec == "flac":
            from kneaddata_spark.functions.flaccodec import encode_flac

            raw = encode_flac(s16.view(np.int16), 16000)
        else:
            raw = rules.FAKE_MAGIC[codec] + struct.pack("<I", len(s16.tobytes())) + s16.tobytes()
        dec = decode_pcm(raw, codec)
        assert dec is not None and len(dec) == 64
        # u8: 127-vs-128 scale mismatch + 0.5 LSB quantization ≈ 0.011
        tol = 1 / 80.0 if codec == "pcm_u8" else 1 / 12000.0
        assert np.abs(dec - pcm).max() < tol


def test_decode_rejects_garbage():
    assert decode_pcm(b"", "pcm_s16le") is None
    assert decode_pcm(b"\x00", "pcm_s16le") is None  # odd length
    assert decode_pcm(b"XXXX\x00\x00\x00\x00", "flac") is None  # bad magic
    assert decode_pcm(b"junk", "wav") is None  # too short for a RIFF header
    assert decode_pcm(b"junk", "nosuch") is None  # unknown codec


def test_models_deterministic(models):
    from kneaddata_spark.models import train_langid, train_perplexity

    li2, pm2 = train_langid(), train_perplexity()
    assert np.array_equal(models[0].profiles, li2.profiles)
    assert np.array_equal(models[1].bigram, pm2.bigram)


def test_langid_batch_matches_one(models):
    li = models[0]
    texts = ["the quick and the dead", "el que no ve", None, "", "der die und das"]
    langs, confs = li.score_batch(texts)
    for i, t in enumerate(texts):
        l1, c1 = li.score_one(t) if t else ("und", 0.0)
        assert langs[i] == l1
        assert abs(confs[i] - c1) < 1e-4


def test_ppl_batch_matches_one(models):
    pm = models[1]
    texts = ["the and of to in", "word salad entropy xyzzy", ""]
    batch = pm.ppl_batch(texts)
    for i, t in enumerate(texts):
        assert abs(batch[i] - pm.ppl_one(t)) / max(pm.ppl_one(t), 1) < 1e-9


def test_scrub_patterns():
    s = (
        "mail a.b@c.de now, ssn 523-12-9876, card 4111 1111 1111 1111, "
        "call +1 (415) 555-0133, host 10.0.0.1"
    )
    out = scrub_text(s)
    assert "<EMAIL>" in out and "<SSN>" in out and "<CCNUM>" in out
    assert "<PHONE>" in out and "<IP>" in out
    assert "523-12" not in out and "4111" not in out


def test_scrub_java_python_regex_parity(spark):
    """SURVEY.md hard part (a): JVM regexp_replace output must equal
    python re.sub output for every pattern on a battery of tricky inputs."""
    from pyspark.sql import functions as F

    from kneaddata_spark.functions.text import scrub_col

    battery = [
        "plain text no pii",
        "a@b.co x@y.z.org trailing@dot.",
        "1-2-3 12-34-5678 123-45-6789 1234-56-7890",
        "4111111111111111 and 4111 1111 1111 1111 1111",  # 16 and 20 digits
        "+44 20 7946 0958; (02) 1234 5678",
        "999.999.999.999 1.2.3.4.5 256.1.1.1",
        "mixed: a@b.io 1.2.3.4 111-22-3333 +1 212 555 0100",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in battery], ["t"])
    got = [r[0] for r in df.select(scrub_col(F.col("t"))).collect()]
    want = [scrub_text(s) for s in battery]
    assert got == want
