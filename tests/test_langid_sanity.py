"""Sanity tests for the language-ID heuristic on real sentences (the
synthetic corpus is shuffled English vocabulary, so the oracle gate can
only pin determinism — these pin usefulness)."""

from __future__ import annotations

from tile_processor_spark.plans.llm_ops import CJK_PATTERN, LANG_STOPWORDS

import re


def _predict(text: str) -> str:
    toks = [t for t in text.lower().split() if t]
    if re.search(CJK_PATTERN, text):
        return "zh"
    scores = {
        lang: sum(1 for t in toks if t in sw) for lang, sw in LANG_STOPWORDS.items()
    }
    if not any(scores.values()):
        return "und"
    for lang in ("en", "de", "fr", "es"):  # fixed priority tie-break
        if scores[lang] == max(scores.values()):
            return lang
    raise AssertionError


def test_langid_real_sentences():
    assert _predict("the quick brown fox jumps over the lazy dog and runs") == "en"
    assert _predict("der hund und die katze laufen durch das haus") == "de"
    assert _predict("le chat et les chiens sont dans la maison") == "fr"
    assert _predict("el perro y los gatos corren por una casa") == "es"
    assert _predict("这是一个中文句子") == "zh"
    assert _predict("zxcv qwer asdf") == "und"
