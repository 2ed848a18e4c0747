"""Property-based parity: the vectorized integer-domain audio kernel must
agree with the per-row float oracle on ARBITRARY inputs, not just the
synthetic corpus — random payloads, wrong magics, odd lengths, truncations,
boundary sample values (the reference's robustness surface: kneaddata
sniffs/validates its inputs, utilities.py:537-574)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kneaddata_spark import oracle, rules
from kneaddata_spark.functions.audio import audio_features_batch

CODECS = st.sampled_from(
    ["pcm_s16le", "pcm_u8", "flac", "opus", "mp3", "bogus", "wav"]
)
SRS = st.sampled_from([0, 7, 8000, 16000, 22050, 44100, 48000, 96000])


@st.composite
def clip(draw):
    codec = draw(CODECS)
    sr = draw(SRS)
    dur = draw(st.integers(0, 3000))
    mode = draw(st.sampled_from(["consistent", "random", "empty", "truncated"]))
    if mode == "empty":
        raw = b""
    elif mode == "random":
        raw = draw(st.binary(min_size=0, max_size=400))
    else:
        n = max(0, round(dur * sr / 1000.0))
        n = min(n, 20000)
        # boundary-heavy samples: include exact clip-threshold neighborhoods
        seed = draw(st.integers(0, 2**31 - 1))
        rng = np.random.default_rng(seed)
        s16 = rng.choice(
            np.asarray([-32768, -32736, -32735, -1, 0, 1, 5000, 32735, 32736, 32767]),
            size=n,
        )
        payload = np.asarray(s16, dtype="<i2").tobytes()
        if codec == "pcm_u8":
            raw = (np.asarray(s16, dtype=np.int64) % 256).astype(np.uint8).tobytes()
        elif codec == "pcm_s16le":
            raw = payload
        elif codec in rules.FAKE_MAGIC:
            raw = rules.FAKE_MAGIC[codec] + struct.pack("<I", len(payload)) + payload
        else:
            raw = payload
        if mode == "truncated":
            raw = raw[: len(raw) * 2 // 3]
    return {"codec": codec, "sr_hz": sr, "dur_ms": dur, "bytes": raw}


@settings(max_examples=150, deadline=None)
@given(st.lists(clip(), min_size=1, max_size=12))
def test_kernel_matches_oracle(rows):
    feat = audio_features_batch(
        np.asarray([r["bytes"] for r in rows], dtype=object),
        np.asarray([r["codec"] for r in rows], dtype=object),
        np.asarray([r["sr_hz"] for r in rows], dtype=np.int64),
        np.asarray([r["dur_ms"] for r in rows], dtype=np.int64),
    )
    for i, r in enumerate(rows):
        pcm = oracle.decode_pcm(r["bytes"], r["codec"])
        ok = (
            r["codec"] in rules.VALID_CODECS
            and r["sr_hz"] in rules.VALID_SR_HZ
            and pcm is not None
        )
        if ok:
            n_exp = round(r["dur_ms"] * r["sr_hz"] / 1000.0)
            ok = n_exp > 0 and abs(len(pcm) - n_exp) <= rules.DECODE_LEN_RTOL * n_exp
        assert bool(feat["decode_ok"][i]) == ok, (i, r["codec"], r["sr_hz"], r["dur_ms"])
        if not ok:
            continue
        a, b = oracle.trim_bounds(pcm, r["sr_hz"])
        assert (feat["trim_start"][i], feat["trim_end"][i]) == (a, b), (i, r)
        assert feat["n_samples"][i] == len(pcm)
        if b > a:
            seg = np.abs(pcm[a:b])
            cf = float(np.mean(seg >= rules.CLIP_SAMPLE_THRESH))
            assert feat["clip_frac"][i] == pytest.approx(cf, abs=1e-12), (i, r)


PII_SAMPLES = [
    "john.doe42@example.com",
    "523-12-9876",
    "4111 1111 1111 1111",
    "+1 (415) 555-0133",
    "192.168.10.44",
]
SAFE_TEXT = st.text(alphabet="abcdefghij klmnop", min_size=0, max_size=60)


@settings(max_examples=120, deadline=None)
@given(st.sampled_from(PII_SAMPLES), SAFE_TEXT, SAFE_TEXT)
def test_scrub_removes_planted_pii(pii, prefix, suffix):
    """Every seeded PII form is removed wherever it appears in safe text,
    and the surrounding text survives (ILLUMINACLIP semantics: cut the
    adapter, keep the read)."""
    scrubbed = oracle.scrub_text(f"{prefix} {pii} {suffix}")
    assert pii not in scrubbed
    assert "<" in scrubbed  # some placeholder was inserted


def test_codec_registry_python_decoder():
    """register_codec seam: a registered per-row decoder (here a toy
    big-endian s16 'codec') must flow through the same vectorized trim/clip
    math and agree with the built-in little-endian path on the same PCM."""
    from kneaddata_spark.functions import audio

    def decode_s16be(raw: bytes):
        if len(raw) % 2 or not raw:
            return None
        return np.frombuffer(raw, dtype=">i2").astype(np.int16)

    audio.register_codec("s16be", decode_s16be)
    old_valid = rules.VALID_CODECS
    rules.VALID_CODECS = old_valid + ("s16be",)
    try:
        rng = np.random.default_rng(3)
        sr, dur = 16000, 1000
        n = sr * dur // 1000
        pcm = (rng.standard_normal(n) * 8000).astype(np.int16)
        pcm[:3000] = 0  # leading silence -> nontrivial trim
        le, be = pcm.tobytes(), pcm.astype(">i2").tobytes()
        feat = audio.audio_features_batch(
            np.asarray([le, be], dtype=object),
            np.asarray(["pcm_s16le", "s16be"], dtype=object),
            np.asarray([sr, sr], dtype=np.int64),
            np.asarray([dur, dur], dtype=np.int64),
        )
        assert bool(feat["decode_ok"][0]) and bool(feat["decode_ok"][1])
        assert feat["trim_start"][0] == feat["trim_start"][1]
        assert feat["trim_end"][0] == feat["trim_end"][1]
        assert feat["clip_frac"][0] == feat["clip_frac"][1]
    finally:
        rules.VALID_CODECS = old_valid
        audio.CODECS.pop("s16be", None)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from([0, 5, 200, 327, 328, 400, 8000, 32767, -32768, -328]),
        min_size=0,
        max_size=4000,
    ),
    st.sampled_from([0, 7, 8000, 16000, 44100]),
)
def test_vad_kernel_property(samples, sr):
    """segment_samples (vectorized numpy run-length + merge) vs an
    independent scalar re-derivation, on boundary-heavy inputs: energies
    straddling VAD_ENERGY_MIN exactly, empty/short arrays, sr that yields
    frame_len 0."""
    from kneaddata_spark.operators.vad import segment_samples

    x = np.asarray(samples, dtype=np.int16)
    got = segment_samples(x, sr)

    fl = sr * rules.VAD_FRAME_MS // 1000
    if fl <= 0 or len(x) // fl == 0:
        assert got == []
        return
    nf = len(x) // fl
    speech = [
        sum(abs(int(v)) for v in x[i * fl : (i + 1) * fl]) // fl
        >= rules.VAD_ENERGY_MIN
        for i in range(nf)
    ]
    runs, cur = [], None
    for i, s in enumerate(speech):
        if s and cur is None:
            cur = i
        if not s and cur is not None:
            runs.append((cur, i))
            cur = None
    if cur is not None:
        runs.append((cur, nf))
    merged = []
    for s, e in runs:
        if merged and s - merged[-1][1] <= rules.VAD_MAX_GAP:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    want = [(s, e) for s, e in merged if e - s >= rules.VAD_MIN_FRAMES]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    st.sampled_from(rules.VALID_SR_HZ),
    st.sampled_from(rules.VALID_SR_HZ),
)
def test_resample_kernel_property_vs_replica(samples, sr_src, sr_dst):
    """resample_linear == the per-sample integer formula from its module
    docstring, for every valid rate pair (integer AND non-integer
    ratios), arbitrary signals including extremes, and empty input; the
    length law n_out = n * dst // src always holds."""
    import numpy as np

    from kneaddata_spark.operators.resample import resample_linear

    x = np.array(samples, dtype=np.int16)
    y = resample_linear(x, sr_src, sr_dst)
    if sr_src == sr_dst:
        assert y is x
        return
    n = len(x)
    n_out = n * sr_dst // sr_src
    assert len(y) == (n_out if n else 0)
    for i in range(len(y)):
        num = i * sr_src
        k = num // sr_dst
        rem = num - k * sr_dst
        k1 = min(k + 1, n - 1)
        want = (int(x[k]) * (sr_dst - rem) + int(x[k1]) * rem) // sr_dst
        assert int(y[i]) == want


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    st.integers(1, 20000),
)
def test_loudness_kernel_property_vs_replica(samples, target_rms):
    """loudness_gain/apply_gain == the documented Q15 integer formula:
    integer RMS via isqrt, capped gain, arithmetic-shift apply with rail
    clipping — for arbitrary signals and targets."""
    import math

    import numpy as np

    from kneaddata_spark.operators.resample import apply_gain, loudness_gain

    cap = 1 << 18
    x = np.array(samples, dtype=np.int16)
    rms, gain = loudness_gain(x, target_rms, cap)
    if len(x) == 0:
        assert (rms, gain) == (0, cap)
        return
    want_rms = math.isqrt(sum(int(v) * int(v) for v in x) // len(x))
    assert rms == want_rms
    assert gain == min(target_rms * 32768 // max(want_rms, 1), cap)
    y = apply_gain(x, gain)
    for v, w in zip(x, y):
        assert int(w) == max(-32768, min(32767, (int(v) * gain) >> 15))


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters=" \t\n\r\x0b\x0c"
                ),
                min_size=1,
                max_size=8,
            ),
            st.integers(1, 50),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(0, 40),
)
def test_bpe_property_lossless_and_rank_equivalence(type_counts, n_merges):
    """For arbitrary unicode word-type tables and any number of learned
    merges: (1) encoding is lossless segmentation (tokens concatenate to
    word + '</w>'), (2) greedy lowest-rank application == replaying the
    merge list in training order (the equivalence the engine relies on),
    (3) training is deterministic under input order permutation."""
    from kneaddata_spark.operators.bpe import encode_word, merge_loop

    # dedupe words (the table is keyed); keep first count
    seen = {}
    for w, n in type_counts:
        seen.setdefault(w, n)
    table = list(seen.items())
    merges = merge_loop(table, n_merges)
    assert merges == merge_loop(list(reversed(table)), n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in seen:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"
        # replay-in-order formulation
        sym = tuple(w) + ("</w>",)
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = tuple(out)
        assert toks == list(sym), (w, merges)
