"""Language material + deterministic transcript generators.

Six languages with Zipf skew (en hot bucket — FIXTURES.md §1) used by:
  * datagen          — synthesizing per-clip transcripts
  * core.langid      — training the hashed char-n-gram classifier
  * core.lm          — training the per-language char n-gram LM

Everything is ASCII / Latin-1 letters only (no unicode whitespace), so Java
and Python regex dialects agree on the native rule expressions
(SURVEY.md §7.4 risk 2).
"""

from __future__ import annotations

import numpy as np

# Zipf-ish language mix; en ~= 55% (hot-bucket skew for salted-agg tests)
LANGS = ("en", "es", "de", "fr", "zh", "ru")
LANG_PROBS = (0.55, 0.16, 0.10, 0.08, 0.06, 0.05)

WORDS = {
    "en": (
        "the of and to in is was for on that with as his they at be this have from or had "
        "by word but not what all were when your can said there use each which she how their "
        "will other about out many then them these so some would make like him into time has "
        "look two more write go see number no way could people my than first water been call "
        "who oil its now find long down day did get come made may part over new sound take "
        "only little work know place year live me back give most very after thing our just "
        "name good sentence man think say great where help through much before line right too "
        "mean old any same tell boy follow came want show also around form three small set put "
        "end does another well large must big even such because turn here why ask went men read "
        "need land different home us move try kind hand picture again change off play spell air "
        "away animal house point page letter mother answer found study still learn should world"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como estar tener le lo todo "
        "pero mas hacer o poder decir este ir otro ese si me ya ver porque dar cuando muy sin "
        "vez mucho saber sobre mi alguno mismo yo tambien hasta ano dos querer entre asi primero "
        "desde grande eso ni nos llegar pasar tiempo ella bien dia uno siempre hombre algo casa "
        "mundo nuevo cada salir hablar parte vida quedar siempre trabajo donde ahora despues "
        "lugar nunca mujer pais gente tanto menos nuevo aqui mientras ciudad noche llamar agua "
        "forma contra creer manera cosa seguir empezar corazon momento verdad palabra nino"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf fur ist im dem nicht ein eine als auch "
        "es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem uber "
        "einen so zum war haben nur oder aber vor zur bis mehr durch man sein wurde sei welt "
        "jahr wenn schon weil dann unter wir sehr selbst hier alle wieder mein zeit gegen "
        "leben immer heute ohne kann ihnen ihre damit etwa zwischen wasser haus tag nacht "
        "mensch stadt land kind frau mann arbeit schule strasse buch wort sprache frage antwort"
    ).split(),
    "fr": (
        "le de un etre et a il avoir ne je son que se qui ce dans en du elle au pour pas "
        "vous par sur faire plus dire me on mon lui nous comme mais pouvoir avec tout y aller "
        "voir bien ou sans tu ou leur homme si deux mari moi vouloir te femme venir quand "
        "grand celui ou notre devoir la entre encore tous jour monde temps main chose vie "
        "rien petit eau maison nuit terre pays ville enfant mot langue question reponse "
        "travail ecole rue livre coeur toujours jamais apres avant depuis pendant contre"
    ).split(),
    # pinyin-ish syllable stream (ASCII)
    "zh": (
        "de shi bu le ren zai you ta zhe zhong da shang ge men dao shuo wei zi guo nian "
        "jiu na neng dui sheng hui xia zi yao chu ye ke shi yi jian xin wo yong ta fang "
        "xing mian hao xiao ming jing tian qi hou gong zuo san jia dong xi bei nan shui "
        "huo shan feng yu xue tu mu jin shu ri yue xing kong hai lu chuan che ma niu yang"
    ).split(),
    # russian-translit syllable stream (ASCII)
    "ru": (
        "i v ne na ya byt on s chto a po eto ona k no oni my kak iz u kotoryj to za svoj "
        "ves god ot tak o dlya vy mozhet eshchyo net bylo tolko sebya svoyo kogda dazhe "
        "zhizn chelovek den ruka raz rabota slovo mesto voda dom noch zemlya strana gorod "
        "rebyonok zhenshchina muzhchina vremya mir glaz golova drug vopros otvet kniga"
    ).split(),
}

# ---------------------------------------------------------------- PII material

PII_EMAIL_USERS = ("john.doe", "alice", "bob_smith", "maria.garcia", "wei.chen", "ivan.petrov")
PII_EMAIL_DOMAINS = ("example.com", "mail.test", "corp.example.org", "web.example.net")
PII_URL_HOSTS = ("example.com", "test.example.org", "data.example.net")
TOXICITY_LEXICON = (
    # synthetic placeholder profanity tokens (deterministic datagen markers)
    "frakk", "smeghead", "gorram", "felgercarb", "shazbot", "dren", "frell", "yotz"
)


def zipf_lang(u: float) -> str:
    """Map a uniform [0,1) draw to a language code by the Zipf mix.

    >>> zipf_lang(0.0)      # en holds the first 55% of mass
    'en'
    >>> zipf_lang(0.60)
    'es'
    >>> zipf_lang(0.9999)
    'ru'
    """
    acc = 0.0
    for lang, p in zip(LANGS, LANG_PROBS):
        acc += p
        if u < acc:
            return lang
    return LANGS[-1]


def gen_sentence(rng: np.random.Generator, lang: str, n_words: int) -> str:
    """Deterministic word-sampled sentence for `lang` (Zipf-ish word ranks)."""
    words = WORDS[lang]
    # Zipf-like rank sampling: favors early (frequent) words; top-word mass ~10%
    ranks = np.minimum(
        (rng.pareto(0.9, size=n_words) * 8).astype(np.int64), len(words) - 1
    )
    return " ".join(words[r] for r in ranks)


def gen_email(rng: np.random.Generator) -> str:
    u = PII_EMAIL_USERS[int(rng.integers(len(PII_EMAIL_USERS)))]
    d = PII_EMAIL_DOMAINS[int(rng.integers(len(PII_EMAIL_DOMAINS)))]
    return f"{u}{int(rng.integers(100))}@{d}"


def gen_phone(rng: np.random.Generator) -> str:
    a, b, c = rng.integers(200, 999), rng.integers(100, 999), rng.integers(1000, 9999)
    style = int(rng.integers(3))
    if style == 0:
        return f"({a}) {b}-{c}"
    if style == 1:
        return f"{a}-{b}-{c}"
    return f"+1 {a} {b} {c}"


def gen_ssn(rng: np.random.Generator) -> str:
    return f"{rng.integers(100, 899):03d}-{rng.integers(10, 99):02d}-{rng.integers(1000, 9999):04d}"


def gen_ipv4(rng: np.random.Generator) -> str:
    return ".".join(str(int(x)) for x in rng.integers(1, 255, size=4))


def gen_url(rng: np.random.Generator) -> str:
    h = PII_URL_HOSTS[int(rng.integers(len(PII_URL_HOSTS)))]
    path = int(rng.integers(10000))
    scheme = "https" if rng.integers(2) else "http"
    return f"{scheme}://{h}/page/{path}"


PII_GENERATORS = (gen_email, gen_phone, gen_ssn, gen_ipv4, gen_url)

SYMBOL_NOISE_CHARS = list("#$%^&*~`|\\{}[]<>=+@!?;:")


# --- compressibility quality signal (q163) ----------------------------------

CR_MIN_BYTES = 32  # below this, the zlib header dominates: flag short instead
CR_LO_PCT = 45  # comp/raw below 45% -> boilerplate / repetition junk
CR_HI_PCT = 120  # comp/raw above 120% -> symbol noise / non-text

def compress_metrics(text: str | None) -> tuple[int, int]:
    """(raw_len, comp_len) of the utf-8 encoding under zlib level 6 — the
    classic web-curation compressibility signal (too compressible =
    boilerplate/templating, incompressible = symbol noise). zlib level 6
    output is deterministic for a given input across builds (same fixed
    Huffman/deflate parameters), so a committed fixture pins it bit-exact.

    >>> compress_metrics(None)
    (0, 0)
    >>> raw, comp = compress_metrics("the cat sat on the mat " * 40)
    >>> raw == 920 and comp < raw // 10  # heavy repetition compresses away
    True
    """
    import zlib

    if text is None:
        return 0, 0
    b = str(text).encode("utf-8")
    if not b.strip():
        return len(b), 0
    return len(b), len(zlib.compress(b, 6))


def compress_keep(raw_len: int, comp_len: int) -> tuple[bool, bool, bool]:
    """(too_repetitive, too_random, keep) from integer cross-multiplied
    band tests: keep iff raw_len >= CR_MIN_BYTES and CR_LO_PCT <=
    100*comp/raw <= CR_HI_PCT. All-integer so any engine re-derives it.

    >>> compress_keep(1000, 200)  # 20% -> boilerplate
    (True, False, False)
    >>> compress_keep(1000, 800)
    (False, False, True)
    >>> compress_keep(10, 9)  # too short to judge
    (False, False, False)
    """
    if raw_len < CR_MIN_BYTES:
        return False, False, False
    rep = 100 * comp_len < CR_LO_PCT * raw_len
    rnd = 100 * comp_len > CR_HI_PCT * raw_len
    return rep, rnd, not rep and not rnd
