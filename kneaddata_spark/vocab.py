"""Deterministic per-language vocabularies and text templates.

Used by the synthetic clip generator (``synth.py``) and by the model
trainers (``models/``) to build language-ID trigram profiles and the
hashed-bigram perplexity table. Everything is seeded and pure-python so
the corpus is reproducible everywhere.
"""

from __future__ import annotations

import numpy as np

# Small but distinctive per-language vocabularies (function words carry the
# trigram signal, content words carry bigram LM mass).
LANG_VOCAB: dict[str, list[str]] = {
    "en": (
        "the and of to in that it was for on with as his they at be this have "
        "from or had by word but what some we can out other were all there when "
        "up use your how said an each she which their time will way about many "
        "then them write would like these her long make thing see him two has "
        "look more day could go come did number sound most people my over know"
    ).split(),
    "es": (
        "el la de que y en un ser se no haber por con su para como estar tener "
        "le lo todo pero más hacer o poder decir este ir otro ese si me ya ver "
        "porque dar cuando muy sin vez mucho saber qué sobre mi alguno mismo yo "
        "también hasta año dos querer entre así primero desde grande eso ni nos"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle au "
        "pour pas vous par sur faire plus dire me on mon lui nous comme mais "
        "pouvoir avec tout y aller voir bien où sans tu ou leur homme si deux "
        "mari moi vouloir te femme venir quand grand celui si notre devoir là"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei einer "
        "um am sind noch wie einem über einen so zum war haben nur oder aber "
        "vor zur bis mehr durch man sein wurde sei schon wenn hatte seine mich"
    ).split(),
    "zh": (
        "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他 时 来 用 们 "
        "生 到 作 地 于 出 就 分 对 成 会 可 主 发 年 动 同 工 也 能 下 过 子 说 "
        "产 种 面 而 方 后 多 定 行 学 法 所 民 得 经 十 三 之 进 着 等 部 度 家"
    ).split(),
}

LANGS = tuple(LANG_VOCAB)


def make_sentence(rng: np.random.Generator, lang: str, n_tokens: int) -> str:
    """One deterministic sentence: zipf-ish draw over the lang vocab."""
    vocab = LANG_VOCAB[lang]
    # zipf-like weights fixed per vocab position
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    w = 1.0 / ranks
    w /= w.sum()
    idx = rng.choice(len(vocab), size=n_tokens, p=w)
    return " ".join(vocab[i] for i in idx)


def training_corpus(lang: str, n_sentences: int = 400, seed: int = 1234) -> list[str]:
    """Deterministic training corpus for the LM / lang-ID models.

    Uses a DIFFERENT seed stream than the clip generator so models are not
    trained on the evaluation rows themselves.
    """
    import zlib

    # zlib.crc32 is stable across processes (builtin str hash is salted)
    rng = np.random.default_rng(np.random.Philox(key=seed + zlib.crc32(lang.encode()) % 1000))
    return [make_sentence(rng, lang, int(rng.integers(6, 30))) for _ in range(n_sentences)]
