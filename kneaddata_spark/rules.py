"""Rule specification for the audio+transcript quality-filter pipeline.

Single source of truth for every threshold and pattern. Both the Spark
engine (``kneaddata_spark.pipeline``) and the pure-pandas oracle
(``kneaddata_spark.oracle``) read these constants; the two *implementations*
are independent (vectorized numpy vs. per-row python) so parity tests are
meaningful.

Rule lineage (reference: biobakery/kneaddata, /root/reference):
 - duration / sample-rate / codec structural gates  <- Trimmomatic MINLEN
   pre-filter (kneaddata/utilities.py:987, config.py:49) and the
   format-validity checks (utilities.py:537-574).
 - silence trim (sliding RMS window)                <- SLIDINGWINDOW:4:20
   (config.py:44, utilities.py:974).
 - post-trim duration ratio                         <- adaptive MINLEN =
   0.5 * input read length (utilities.py:970-971).
 - low-complexity / repeat screens                  <- TRF tandem-repeat
   removal (config.py:59-66, run.py:452-480) and FastQC overrepresented
   sequences (utilities.py:1094-1164).
 - language-ID + perplexity model scores            <- bowtie2/BMTagger
   contaminant DBs (run.py:53-185, 213-274): each model is a "database",
   clean = pass ALL (intersection semantics, run.py:174-185).
 - PII scrub                                        <- ILLUMINACLIP adapter
   trimming (config.py:42-43): remove known-bad substrings, keep the rest.

The canonical rule order below mirrors kneaddata's stage order (trim ->
tandem-repeat -> decontaminate, knead_data.py:534-568); ``drop_rule`` is
the FIRST failing rule, mirroring the stage-suffix taxonomy of
config.py:94-116.
"""

from __future__ import annotations

# --- structural gates (Trimmomatic MINLEN / format validity analogs) -----
MIN_DUR_MS = 300          # MINLEN:60 analog: clips shorter than this drop
MAX_DUR_MS = 30_000       # absurdly long clips drop
VALID_SR_HZ = (8000, 16000, 22050, 44100, 48000)
VALID_CODECS = ("pcm_s16le", "pcm_u8", "flac", "opus", "mp3", "wav")

# --- decode validity ------------------------------------------------------
# decoded sample count must match dur_ms*sr_hz within this relative tol
DECODE_LEN_RTOL = 0.02
# Metadata-only model-scoring gate threshold (ADVICE r2: keep in rules.py,
# not inline in pipeline.scoring_gate_col). n_exp = round(dur_ms*sr_hz/1000)
# is the expected sample count the decode-length rule and oracle.label_row
# share; n_exp >= 1 requires dur_ms*sr_hz > 500 (banker's rounding sends
# exactly 500 -> 0). The gate tests dur_ms*sr_hz >= N_EXP_MIN_DUR_SR — one
# boundary value CONSERVATIVE: a gated-in row that still decodes to
# n_exp = 0 is scored then masked by the verdict (harmless); a gate that
# wrongly excluded a kept row would break parity. Must stay in lockstep
# with the n_exp definition above.
N_EXP_MIN_DUR_SR = 500

# --- silence trim (SLIDINGWINDOW analog) ----------------------------------
TRIM_WIN_MS = 25          # window length (4-base window analog)
TRIM_DB_FLOOR = -40.0     # window mean RMS below this (dBFS) = silence
POST_TRIM_MIN_RATIO = 0.5 # MINLEN = 0.5 * input length analog
POST_TRIM_MIN_MS = 200    # absolute floor after trimming

# --- clipping screen ------------------------------------------------------
CLIP_SAMPLE_THRESH = 0.999  # |sample| >= this counts as clipped
CLIP_FRAC_MAX = 0.03        # more than 3% clipped samples -> drop

# --- voice-activity segmentation (operators/vad.py) -----------------------
# Integer-domain by construction so the engine kernel and the pure-python
# test replica agree bit-for-bit (the clip-threshold discipline above):
# a frame of frame_len = sr * VAD_FRAME_MS // 1000 samples is SPEECH when
# sum(|x|) // frame_len >= VAD_ENERGY_MIN (mean-abs analog of the -40 dBFS
# trim floor: 0.01 * 32768 = 327.68 -> 328 on int16, integer compare only).
VAD_FRAME_MS = 25
VAD_ENERGY_MIN = 328
VAD_MIN_FRAMES = 3   # segments shorter than this are noise ticks, dropped
VAD_MAX_GAP = 2      # silence gaps <= this many frames merge (hangover)

# --- mains-hum + DC-offset screen (operators/hum.py) ------------------------
# Electrical recording-chain defects: 50/60 Hz ground-loop hum and DC bias.
# Q15 integer cos/sin probes (basis = round_half_even(cos * 32767)); the
# hum fraction is calibrated so a full-scale pure tone AT the probe
# frequency scores ~1000 permille: (a^2+b^2)*2000 // (sum(x^2)*n*32767^2),
# python-int exact. DC is sum(x) // n in raw int16 units (floor division).
# Exactly TWO probe frequencies by schema contract (hum50/hum60 columns).
HUM_FREQS_HZ = (50, 60)
HUM_MIN_CYCLES = 4       # need >= 4 cycles of the lowest probe to resolve
HUM_MAX_PERMILLE = 250   # >= 25% of clip power at one mains probe -> drop
DC_OFFSET_MAX = 164      # |dc| >= this (~0.5% of full scale) -> dc defect

# --- media probe (operators/mediaprobe.py) ----------------------------------
# Header-only metadata audit: probed duration (container-claimed samples /
# effective sample rate) may differ from the table's dur_ms by at most
# this before the row is flagged. Healthy synth rows round-trip within
# 1 ms; the tolerance absorbs integer-division loss at any real sr.
PROBE_DUR_TOL_MS = 50

# --- bandwidth screen (operators/bandwidth.py) ------------------------------
# Effective-bandwidth estimation: a 3-level integer halfband filterbank
# (7-tap kernel BW_KERNEL, exact int64 convolution over the valid region,
# floor-div-32 renormalization between levels) splits the spectrum at
# sr/4, sr/8, sr/16. oct{1,2,3}_permille = 1000*e_hi // (e_hi + e_lo) at
# each level; the estimated effective Nyquist is the band ceiling of the
# HIGHEST octave whose permille >= BW_ACTIVE_MIN_PERMILLE (sr/2, sr/4,
# sr/8, else sr/16). narrowband = est_nyquist_hz * 2 < sr_hz — content
# that a proper resampler upsampled from a lower rate (near-zero energy
# above the original Nyquist), the classic training-poison an SNR/VAD
# screen cannot see.
BW_KERNEL = (-1, 0, 9, 16, 9, 0, -1)   # halfband; gain 32 at DC, 0 at Nyquist
BW_MIN_SAMPLES = 64                    # below this the 3rd level has no valid region
BW_ACTIVE_MIN_PERMILLE = 10            # >= 1% of the level's energy -> octave active

# --- reverb / decay-tail screen (operators/reverb.py) -----------------------
# Offset-anchored blind decay estimate: frame energies over
# REVERB_FRAME_MS windows; the free-decay region starts at the LAST frame
# whose energy clears peak // REVERB_ACTIVE_DIV (the end of strong
# content — decay measured anywhere earlier is masked by ongoing signal).
# Schroeder backward integration (EDC = suffix-sum of tail energies);
# t20 = first tail frame where EDC <= EDC0 // REVERB_T20_DIV (-20 dB),
# rt60_ms = 3 * t20 * REVERB_FRAME_MS (T20 -> T60 extrapolation; for an
# exponential tail with time constant tau this lands on the physical
# RT60 = 6.91*tau). Decays that never reach -20 dB inside the clip are
# status='truncated' — masked by ongoing content or noise floor, NOT a
# certified defect, so truncated rows keep (deviation from the hum/snr
# unmeasurable-is-not-a-pass convention, documented: nearly every dry
# clip with a noise floor is truncated, and a screen that drops the
# whole corpus screens nothing; the status column lets a stricter
# curator drop). Resolved rt60_ms >= REVERB_MAX_RT60_MS -> reverberant.
REVERB_FRAME_MS = 20
REVERB_ACTIVE_DIV = 100     # active frame: e >= max(peak // 100, 1) (-20 dB)
REVERB_T20_DIV = 100        # EDC -20 dB point
REVERB_MAX_RT60_MS = 500    # resolved decay at/above this -> drop

# --- dynamic-range / overcompression screen (operators/dynrange.py) ---------
# EBU-R128-LRA-style loudness-range proxy, integer-exact: frame energies
# over DR_FRAME_MS windows, gated to ACTIVE frames (e >= max(peak //
# DR_GATE_DIV, 1), ~-30 dB of peak — silence must not fake dynamics, the
# R128 absolute-gate idea); sort active energies ascending and take
# p10/p95 at floor index (n_active - 1) * p // 100. dr_ratio_permille =
# p10 * 1000 // p95: ~1000 = brick-walled (p10 within a whisker of p95),
# ~0 = naturally dynamic. compressed when the ratio clears
# DR_COMPRESSED_MIN_PERMILLE (500 = p10 within 3 dB of p95) over at
# least DR_MIN_FRAMES active frames. Limiter-crushed broadcast/ad audio
# passes VAD/SNR/pitch/hum/bandwidth/reverb and is still low-value for
# acoustic training; this is the loudness-range axis.
DR_FRAME_MS = 20
DR_GATE_DIV = 1000             # active frame: e >= max(peak // 1000, 1)
DR_MIN_FRAMES = 10             # need >= 10 active frames to resolve a range
DR_COMPRESSED_MIN_PERMILLE = 500   # p10 >= half of p95 (-3 dB) -> compressed

# --- SNR screen (operators/snr.py) -----------------------------------------
# Frames classify speech/noise by the VAD rule above; the clip's SNR proxy
# is the integer POWER ratio speech_meansq div max(noise_meansq, 1), where
# meansq = sum(x^2) div n_samples over each class. Keep needs both classes
# present and ratio >= SNR_MIN_RATIO (10x power ~ 10 dB). No-noise-floor
# clips report status='clean' (keep), no-speech clips 'no_speech' (drop).
SNR_MIN_RATIO = 10

# --- pitch / periodicity screen (operators/pitch.py) -----------------------
# Integer-domain autocorrelation over a bounded center window (the VAD
# discipline): measurement lag band [sr div PITCH_MEAS_F0_MAX .. sr div
# PITCH_MEAS_F0_MIN], window of PITCH_WIN samples, int64-exact dot
# products. A clip is VOICED when the best in-band autocorrelation clears
# PITCH_VOICED_MIN_PERMILLE of the lag-0 energy, and SPEECHLIKE when
# additionally 100*PITCH_F0_MIN_HZ <= f0_centi_hz <= 100*PITCH_F0_MAX_HZ
# (the human-F0 band: steady tones/music sit above it, broadband noise
# never clears the periodicity floor).
PITCH_MEAS_F0_MIN = 50    # Hz — largest measured lag = sr div 50
PITCH_MEAS_F0_MAX = 500   # Hz — smallest measured lag = sr div 500
PITCH_WIN = 1024          # autocorrelation window (samples)
PITCH_MIN_WIN = 256       # fewer usable samples than this -> too short
PITCH_VOICED_MIN_PERMILLE = 300
PITCH_F0_MIN_HZ = 60
PITCH_F0_MAX_HZ = 350
# octave guard (the YIN/praat smallest-qualifying-lag rule): best lag is
# the SMALLEST lag whose autocorrelation clears this fraction of the peak
# — any periodic signal also correlates at 2x, 3x its period, and plain
# argmax drifts to whichever multiple is closest to an integer lag.
PITCH_PEAK_TOL_PERMILLE = 950

# --- log-mel filterbank features (operators/fbank.py) ----------------------
# The standard ASR training front-end: 25 ms Hamming frames at a 10 ms
# hop, power spectrum, triangular mel filters from FBANK_FMIN_HZ to
# sr/2 (HTK mel scale 2595*log10(1+f/700)), natural log with an energy
# floor. Frames are FULL frames only (the clip_windows tail rule).
FBANK_N_MELS = 23
FBANK_WIN_MS = 25
FBANK_HOP_MS = 10
FBANK_FMIN_HZ = 20
FBANK_LOG_FLOOR = 1e-10
FBANK_PREEMPH_MILLI = 970   # y[i] = x[i] - 0.970*x[i-1]
# per-clip CMVN: variance floor before the 1/std scale (a constant band —
# e.g. silence pinned at log(FBANK_LOG_FLOOR) — has var 0; flooring makes
# its normalized value 0 instead of a division blow-up)
CMVN_VAR_FLOOR = 1e-8

# --- transcript structural ------------------------------------------------
MIN_TRANSCRIPT_CHARS = 3

# --- low-complexity screens (TRF / FastQC analogs) ------------------------
MIN_CHAR_ENTROPY_BITS = 2.0   # Shannon entropy over characters
MAX_TOKEN_RUN = 6             # same token repeated > this consecutively
MAX_TOP_TOKEN_FRAC = 0.6      # single token > 60% of tokens (len >= 5 tok)
TOP_TOKEN_MIN_TOKENS = 5

# --- language-ID model (bowtie2 "database" #1) ----------------------------
LANGID_HASH_BITS = 15            # trigram hash buckets = 2**15
LANGID_MIN_CONF = 0.05           # cosine margin confidence floor
# (clean sentences score >=0.10 at p1; alphabet gibberish <=0.006 — the
# threshold sits in the empty band between the two populations)
ALLOWED_LANGS = ("en", "es", "fr", "de", "zh")

# --- perplexity model (bowtie2 "database" #2) ------------------------------
PPL_HASH_BITS = 18               # hashed bigram buckets
PPL_ADD_K = 0.1                  # add-k smoothing
PPL_MAX = 2000.0                 # perplexity above this -> drop

# --- canonical rule order (first failing rule wins; config.py:94-116) -----
RULE_ORDER = (
    "dur_bounds",      # structural duration gate
    "sr_invalid",      # sample-rate whitelist
    "codec_invalid",   # codec whitelist
    "decode_error",    # undecodable bytes / length mismatch
    "post_trim_short", # silence-trimmed remainder too short
    "clipping",        # too many clipped samples
    "transcript_empty",
    "low_entropy",     # char-entropy screen
    "repeat_run",      # tandem token repeat (TRF analog)
    "top_token",       # overrepresented token (FastQC analog)
    "langid",          # language not allowed / low confidence
    "perplexity",      # n-gram LM perplexity too high
)

# --- PII scrub patterns (ILLUMINACLIP analog) ------------------------------
# Ordered (pattern, replacement). Patterns are written in the common subset
# of Java regex (Spark regexp_replace) and Python re so both produce
# byte-identical output (SURVEY.md hard-part (a)).
SCRUB_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CCNUM>"),
    (r"\+?\d{1,3}[ .-]?\(?\d{2,3}\)?[ .-]?\d{3}[ .-]?\d{4}", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)

# --- mojibake repair map (encoding-artifact screen) ------------------------
# UTF-8 text mis-decoded as latin-1/cp1252 once and re-encoded — the most
# common encoding corruption in web corpora (ftfy's headline case). Ordered
# (artifact, repaired) LITERAL pairs applied as a plain replace chain on both
# engines; every artifact here is the cp1252 rendering of one UTF-8-encoded
# code point, the pairs are prefix-disjoint (no artifact is a substring of
# another), and no repaired value contains an artifact, so application order
# is immaterial and per-pattern counts are independent.
MOJIBAKE_MAP = (
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã©", "é"),  # Ã© -> é
    ("Ã­", "í"),  # Ã­ -> í
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã§", "ç"),  # Ã§ -> ç
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> – (en dash)
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
    ("Â\u00a0", " "),  # Â + nbsp -> plain space (escape: invisible char)
)

# --- Gopher/MassiveText document-quality rules (Rae et al. 2021, A1.1) ----
# All thresholds are integers so the keep verdicts are exact-integer
# comparisons on both engines (the repetition_screen lesson): mean word
# length in [3, 10] is evaluated as 3*n_words <= word_chars <= 10*n_words,
# the 0.1 symbol ratio as 10*n_sym <= n_words, the 80% alpha-word rule as
# 100*n_alpha >= 80*n_words, the 90%/30% line rules likewise.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_SYMBOL_MAX_PER_10_WORDS = 1  # '#' + '...' count <= 0.1 * words
GOPHER_MIN_ALPHA_WORD_PCT = 80
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_BULLET_LINE_PCT = 90
GOPHER_MAX_ELLIPSIS_LINE_PCT = 30

# --- speaking-rate screen (audio-text alignment sanity) --------------------
# chars-per-second bounds in centi-cps (integer: chars * 100000 div dur_ms).
# Outside [2, 35] chars/s the transcript plausibly doesn't belong to the
# audio (truncated/duplicated transcript, wrong clip, or concatenation
# artifacts) — the cheap alignment screen ASR pipelines run before paying
# for forced alignment.
RATE_MIN_CPS_CENTI = 200
RATE_MAX_CPS_CENTI = 3_500

# --- main-content (boilerplate) segmentation of crawled HTML ---------------
# jusText-style block verdicts: a segment shorter than MAIN_MIN_SEG_CHARS
# extracted chars is 'short' chrome; one whose anchor-text share reaches
# MAIN_NAV_LINK_PERMILLE is 'nav' (link farms, menus, footers); the rest
# is 'content'. Integer permille so Spark and the SQL oracle agree exactly.
MAIN_MIN_SEG_CHARS = 25
MAIN_NAV_LINK_PERMILLE = 400

# --- dropout / stuck-sample screen (digital-defect detection) --------------
# A run of >= DROPOUT_MIN_RUN_MS identical samples INSIDE the active
# region (between first and last nonzero sample — leading/trailing
# silence is trimming's business) is a digital defect: zero runs are
# packet-loss / buffer-underrun fill ("dropouts"), nonzero constant runs
# are stuck-sample / DAC-hold glitches. Natural 16-bit audio does not
# hold one exact value that long. Gates are integer permille of the
# active region.
DROPOUT_MIN_RUN_MS = 3
DROPOUT_MAX_PERMILLE = 10
STUCK_MAX_PERMILLE = 10

# --- click / pop screen (impulsive-defect detection) -----------------------
# A sample whose second difference |x[i-1] - 2x[i] + x[i+1]| exceeds BOTH
# CLICK_MIN_ABS and CLICK_MAD_MULT * (mean |d2| of the clip) is impulsive
# — vinyl-style clicks, digital pops, splice ticks. The MAD-relative arm
# keeps loud-but-smooth speech out (plosives ride the clip's own d2
# scale); the absolute floor keeps near-silent clips from flagging their
# own quantization noise. Adjacent flagged samples merge into one event;
# the verdict gates events per minute (integer: events * 60 * sr // n).
CLICK_MAD_MULT = 10
CLICK_MIN_ABS = 4000
CLICK_MAX_PER_MIN = 10

# --- soft-404 / error-page screen (crawl stage-zero) -----------------------
# A crawled page that returned HTTP 200 but carries an error TEMPLATE is a
# "soft 404" — it poisons dedup (thousands of identical "not found" bodies)
# and quality stats. Verdict: title matching SOFT404_TITLE_RE is decisive;
# an error PHRASE in the body only counts when the body is also short
# (< SOFT404_MIN_CHARS extracted chars) so an article ABOUT 404 pages
# survives. Patterns stick to the RE2/Java shared regex subset.
SOFT404_TITLE_RE = r"(?i)(404|not found|forbidden|unavailable|error)"
SOFT404_PHRASE_RE = (
    r"(?i)(page (was )?not found|access denied|temporarily unavailable"
    r"|an error occurred|does not exist)"
)
SOFT404_MIN_CHARS = 120

# --- robots.txt crawl-policy filter ----------------------------------------
# Google/RFC 9309 matching semantics: among the rules of a URL's host
# whose path-prefix matches, the LONGEST prefix wins; on a length tie,
# Allow beats Disallow; a URL with no matching rule is allowed. Encoded
# as integer best_key = 2*len(prefix) + allow so one max() resolves both
# the length and the tie rule (portable to the SQL oracle verbatim).

# --- per-domain quality card ------------------------------------------------
# Domain-level curation (RefinedWeb/C4 run URL+domain filters before any
# per-document screen): a domain whose share of low-yield pages
# (kept_permille < DOMAIN_LOW_KEPT_PERMILLE after HTML extraction)
# reaches DOMAIN_REVIEW_PERMILLE is flagged for blocklist review.
DOMAIN_LOW_KEPT_PERMILLE = 550
DOMAIN_REVIEW_PERMILLE = 500

# --- outlink profile / link-farm screen -------------------------------------
# A page that is mostly EXTERNAL links (and has enough links for the
# ratio to mean anything) is link-farm shaped — SEO chrome, not content.
LINKFARM_MIN_LINKS = 4
LINKFARM_EXT_PERMILLE = 700

# --- per-domain template-line removal ---------------------------------------
# A LINE appearing on >= TEMPLATE_DF_PERMILLE of a domain's pages (and on
# at least TEMPLATE_MIN_DOCS pages) is chrome/template (nav, footer,
# cookie banner) — removed from EVERY page, including the first seen
# (unlike paragraph_dedup's keep-first: boilerplate has no canonical copy
# worth keeping).
TEMPLATE_DF_PERMILLE = 500
TEMPLATE_MIN_DOCS = 3

# --- URL quality screen (RefinedWeb-style fetch-time features) --------------
# Cheap URL-shape heuristics a crawler applies BEFORE paying to fetch:
# deep paths, parameter farms, and digit-heavy paths correlate with
# calendar/session/spam pages. First-failing verdict taxonomy.
URLQ_MAX_DEPTH = 8
URLQ_MAX_PARAMS = 6
URLQ_MAX_DIGIT_PERMILLE = 400
URLQ_MAX_PATH_LEN = 160

# --- end-to-end web corpus build --------------------------------------------
# Minimum extracted chars for a page to enter the corpus (C4 drops
# sub-paragraph pages before any scoring pays to run).
WEBCORPUS_MIN_CHARS = 200

# --- frontier politeness scheduler ------------------------------------------
# At most FRONTIER_PER_WAVE URLs of one host fetch in the same wave; a
# crawler runs wave 0 everywhere, then wave 1, ... so cross-host
# parallelism stays maximal while per-host concurrency is bounded.
FRONTIER_PER_WAVE = 2

# --- declared-language metadata screen --------------------------------------
# The <html lang="..."> attribute is self-reported metadata; pipelines
# route documents by it, so a mismatch against the catalog/detected
# language mis-buckets the document. Verdict taxonomy: 'match',
# 'mismatch', 'missing' (no lang attribute on the page).

# fake container magics used by the deterministic synthetic encoder/decoder
# (real opus/mp3 codec libraries are not in this container; the decode
# step for those codecs is a clearly-marked deterministic fake: a magic
# header + little-endian s16 payload. The Spark-side plumbing — schema,
# batching, partitioning — is real. `flac` rows carry REAL FLAC streams
# since r5: functions/flaccodec.py implements the mono/16-bit subset of
# the public spec in-repo, so flac left this table.)
FAKE_MAGIC = {"opus": b"KSOP", "mp3": b"KSMP"}
