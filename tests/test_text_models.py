"""langid / perplexity / scrub kernels: accuracy, determinism, edge cases."""

import numpy as np

from datasmith_spark.core import langid, lm, text
from datasmith_spark.core.scrub import scrub_text


def test_langid_accuracy_on_fresh_text():
    m = langid.model()
    rng = np.random.default_rng(999)  # disjoint from training seeds
    correct = total = 0
    for li, lang in enumerate(text.LANGS):
        for _ in range(50):
            s = text.gen_sentence(rng, lang, 25)
            pred, prob = m.predict_one(s)
            total += 1
            correct += pred == lang
    assert correct / total >= 0.99, correct / total


def test_langid_empty_and_junk():
    m = langid.model()
    assert m.predict_one(None) == (None, 0.0)
    assert m.predict_one("   ") == (None, 0.0)
    _, prob = m.predict_one("@@## $$%% ^^&&")
    assert prob < 0.95  # junk should not be confident


def test_langid_deterministic():
    m = langid.model()
    s = "the quick brown fox jumps over the lazy dog"
    assert m.predict_one(s) == m.predict_one(s)


def test_ppl_bands_separate_clean_from_gibberish():
    m = lm.model()
    rng = np.random.default_rng(777)
    for lang in text.LANGS:
        clean = text.gen_sentence(rng, lang, 30)
        assert m.in_band(m.ppl_one(clean, lang), lang), lang
    gibberish = "zqx jvw qqq kkk zzz xxp wvu " * 5
    assert not m.in_band(m.ppl_one(gibberish, "en"), "en")
    assert not m.in_band(float("inf"), "en")


def test_scrub_patterns():
    s, pii, tox = scrub_text(
        "call me at (212) 555-1234 or john.doe42@example.com ssn 123-45-6789 "
        "ip 10.1.2.3 site https://example.com/page/1 you smeghead"
    )
    assert "<PII:PHONE>" in s and "<PII:EMAIL>" in s and "<PII:SSN>" in s
    assert "<PII:IP>" in s and "<PII:URL>" in s and "<TOX>" in s
    assert pii == 5 and tox == 1
    assert "555" not in s and "example.com" not in s


def test_scrub_none_and_clean():
    assert scrub_text(None) == (None, 0, 0)
    s, pii, tox = scrub_text("a perfectly clean sentence")
    assert s == "a perfectly clean sentence" and pii == 0 and tox == 0
