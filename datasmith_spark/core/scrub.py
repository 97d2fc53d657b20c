"""Regex PII / toxicity scrub kernel.

Python ``re`` on BOTH the Spark side (inside an Arrow-batched pandas UDF) and
the oracle side, so regex dialects can never diverge (SURVEY.md §7.4 risk 2).
Direct descendant of the reference's sanitize pass
(/root/reference/src/datasmith/scrape/utils.py:103-107 — regex substitution
scrub) generalized to an ordered PII rule list + toxicity lexicon mask.
"""

from __future__ import annotations

import re

from .text import TOXICITY_LEXICON

# Ordered: more-specific patterns first (email/url before bare IP; SSN before
# phone so 3-2-4 digit groups are never half-eaten by the phone rule).
PII_RULES: tuple[tuple[str, re.Pattern[str]], ...] = (
    ("EMAIL", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")),
    ("URL", re.compile(r"https?://[^\s]+")),
    ("IP", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")),
    ("SSN", re.compile(r"\b\d{3}-\d{2}-\d{4}\b")),
    ("PHONE", re.compile(r"(?:\+1 )?\(?\d{3}\)?[ \-.]\d{3}[ \-.]\d{4}")),
)

_TOX_RE = re.compile(r"\b(?:" + "|".join(map(re.escape, TOXICITY_LEXICON)) + r")\b", re.IGNORECASE)


def scrub_text(text: str | None) -> tuple[str | None, int, int]:
    """Scrub one transcript.

    Returns (scrubbed_text, pii_count, tox_count). PII spans are replaced by
    ``<PII:KIND>`` tokens; toxicity lexicon hits by ``<TOX>``. Deterministic,
    per-row only.

    >>> scrub_text("mail john.doe3@example.com or call (212) 555-0147")
    ('mail <PII:EMAIL> or call <PII:PHONE>', 2, 0)
    >>> scrub_text("what a smeghead")  # lexicon hit, case-insensitive
    ('what a <TOX>', 0, 1)
    >>> scrub_text("SSN 123-45-6789 from 10.0.0.1")
    ('SSN <PII:SSN> from <PII:IP>', 2, 0)
    >>> scrub_text(None)
    (None, 0, 0)
    """
    if text is None:
        return None, 0, 0
    pii = 0
    out = text
    for kind, pat in PII_RULES:
        out, n = pat.subn(f"<PII:{kind}>", out)
        pii += n
    out, tox = _TOX_RE.subn("<TOX>", out)
    return out, pii, tox


def count_words(text: str) -> int:
    """Whitespace-token count; blank/empty strings count zero words.

    >>> count_words("  a  b \\t c ")
    3
    >>> count_words("   ")
    0
    """
    t = text.strip()
    if not t:
        return 0
    return len(re.split(r"\s+", t))
