"""Deterministic seeded generator for the Common-Crawl-style ``pages`` table.

The precedent is sequali's own fixture synthesis: scripts/fastq_create.py
deterministically builds tests/data/100_illumina_adapters.fastq, and the
integration tests assert exact values against it
(reference: tests/test_integration.py:97-137).  Here the generator plants
one document class per operator family (FIXTURES.md §2): clean prose per
language, boilerplate shingles, exact/near duplicates, PII, toxicity,
junk, and degenerate edge cases — all reproducible from a single seed.

Schema (BASELINE.json input_hint):
    url:string  warc_ts:timestamp  html:binary  text:string  lang:string
plus a truth column ``cls`` used only by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

# Synthetic vocabularies with deliberately distinct char-n-gram profiles
# (the langid training corpus is derived from these — analogue of sequali
# shipping contaminant databases in-package).
LANG_VOCAB: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for on that with as his they at be this have "
        "from or one had by word but not what all were when your can said there "
        "use each which she how their will other about out many then them these "
        "some would make like him into time has look two more write go see number "
        "way could people my than first water been call who oil its now find long "
        "down day did get come made may part over house market quality report"
    ).split(),
    "fr": (
        "le la les de des et un une dans pour que qui sur avec est sont était "
        "été par plus pas ne se au aux ce cette ces mais ou où donc car ni or "
        "être avoir faire dire aller voir savoir pouvoir falloir vouloir venir "
        "prendre très bien aussi tout tous toute chose année jour monde pays "
        "homme femme enfant ville maison eau temps vie main chose après avant "
        "grand petit nouveau dernier beau même autre tel quel leur notre votre"
    ).split(),
    "de": (
        "der die das und ist von zu den dem des ein eine einer nicht mit sich "
        "auf für als auch es an werden aus er hat dass sie nach wird bei einem "
        "um am sind noch wie über einen so zum war haben nur oder aber vor zur "
        "bis mehr durch können müssen sollen wollen dürfen mögen lassen machen "
        "jahr zeit mensch welt leben hand stadt wasser straße größe weiß schön "
        "natürlich vielleicht zwischen während außerdem trotzdem deshalb übrigens"
    ).split(),
    "es": (
        "el la los las de que y en un una ser se no haber por con su para como "
        "estar tener le lo todo pero más hacer o poder decir este ir otro ese "
        "si me ya ver porque dar cuando él muy sin vez mucho saber qué sobre mi "
        "alguno mismo yo también hasta año dos querer entre así primero desde "
        "grande eso ni nos llegar pasar tiempo ella sí día uno bien poco deber "
        "entonces poner cosa tanto hombre parecer nuestro tan donde ahora parte"
    ).split(),
}
LANGS = sorted(LANG_VOCAB)

N_HOSTS = 50
# single source of truth for the planted toxicity lexicon: the scrubber
from sequali_spark.functions.scrub import TOX_LITERALS as TOX_WORDS
BASE_TS = pd.Timestamp("2025-06-01 00:00:00")
TS_WINDOW_DAYS = 30


def lang_training_texts(sentences_per_lang: int = 300, seed: int = 1234) -> dict[str, list[str]]:
    """Seeded training corpus for the langid model — independent of any
    generated table, so model weights never depend on corpus scale."""
    rng = np.random.RandomState(seed)
    out: dict[str, list[str]] = {}
    for lang in LANGS:
        vocab = LANG_VOCAB[lang]
        texts = []
        for _ in range(sentences_per_lang):
            k = rng.randint(6, 20)
            texts.append(" ".join(rng.choice(vocab, size=k)))
        out[lang] = texts
    return out


def lm_training_texts(n_docs: int = 500, seed: int = 5678) -> list[str]:
    """Seeded clean-English corpus for the perplexity LM."""
    rng = np.random.RandomState(seed)
    vocab = LANG_VOCAB["en"]
    return [" ".join(rng.choice(vocab, size=rng.randint(30, 120))) for _ in range(n_docs)]


def _sentence(rng: np.random.RandomState, vocab: list[str], n: int) -> str:
    words = list(rng.choice(vocab, size=n))
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _clean_text(rng: np.random.RandomState, lang: str, min_words: int = 40, max_words: int = 260) -> str:
    vocab = LANG_VOCAB[lang]
    total = rng.randint(min_words, max_words)
    parts: list[str] = []
    used = 0
    while used < total:
        n = min(int(rng.randint(6, 18)), total - used) or 1
        parts.append(_sentence(rng, vocab, n))
        used += n
        if rng.rand() < 0.15:
            parts.append("\n")
    return " ".join(parts).replace(" \n ", "\n")


def _host_boilerplate(host_id: int) -> str:
    """Host-wide repeated nav/footer line — the planted overrepresented
    shingle (>= 21 chars so SHINGLE_K windows land inside it)."""
    return (
        f"navigation menu host{host_id:03d} home products pricing contact about "
        f"copyright host{host_id:03d} all rights reserved terms privacy sitemap"
    )


def _pii_fragments(rng: np.random.RandomState) -> list[str]:
    frags = [
        f"user{rng.randint(1, 999)}@example{rng.randint(1, 99)}.com",
        f"{rng.randint(100, 999)}-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
        f"{rng.randint(1, 255)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(1, 255)}",
    ]
    rng.shuffle(frags)
    return frags[: rng.randint(1, 4)]


def _junk_text(rng: np.random.RandomState, kind: int) -> str:
    if kind == 0:  # too short
        return " ".join(rng.choice(LANG_VOCAB["en"], size=rng.randint(1, 5)))
    if kind == 1:  # digit heavy
        return " ".join(str(rng.randint(0, 10**9)) for _ in range(rng.randint(30, 80)))
    if kind == 2:  # punct heavy
        return " ".join("!!!???***###$$$%%%" for _ in range(rng.randint(20, 60)))
    if kind == 3:  # all caps shouting
        return " ".join(w.upper() for w in rng.choice(LANG_VOCAB["en"], size=rng.randint(30, 90)))
    # repeated char runs
    ch = str(rng.choice(list("xz!.")))
    return "start " + ch * int(rng.randint(40, 200)) + " end"


def generate_pages(
    n_rows: int, seed: int = 42, big_doc_chars: int = 100_000, base_index: int = 0
) -> pd.DataFrame:
    """Generate the pages table. Deterministic per (n_rows, seed).

    ``base_index`` offsets the url numbering so multiple deterministic
    chunks (e.g. one per Spark partition) never collide on url."""
    rng = np.random.RandomState(seed)

    # Zipf-skewed host assignment: host 0 is the mega-host (exercises
    # salting, the analogue of sequali's per-tile skew).
    raw = rng.zipf(1.5, size=n_rows)
    host_ids = (raw - 1) % N_HOSTS

    # timestamps: uniform over the window + per-host burst day
    day = rng.uniform(0, TS_WINDOW_DAYS, size=n_rows)
    burst = rng.rand(n_rows) < 0.2
    day[burst] = (host_ids[burst] % TS_WINDOW_DAYS) + rng.uniform(0, 1, size=int(burst.sum()))
    ts = BASE_TS + pd.to_timedelta((day * 86400).astype(np.int64), unit="s")

    classes = rng.choice(
        ["clean_en", "clean_other", "boilerplate", "dup", "pii", "tox", "junk", "degenerate"],
        size=n_rows,
        p=[0.55, 0.15, 0.08, 0.07, 0.05, 0.03, 0.05, 0.02],
    )

    texts: list[str] = []
    langs: list[str] = []
    urls: list[str] = []
    actual_cls: list[str] = []  # cls may degrade (dup with empty pool)
    clean_pool: list[int] = []  # indices of clean docs eligible for duplication
    degenerate_cycle = 0

    for i in range(n_rows):
        host = int(host_ids[i])
        url = f"https://host{host:03d}.example.org/page-{base_index + i:08d}"
        cls = classes[i]
        lang = "en"
        if cls == "clean_en":
            text = _clean_text(rng, "en")
            clean_pool.append(i)
        elif cls == "clean_other":
            lang = str(rng.choice([lang_code for lang_code in LANGS if lang_code != "en"]))
            text = _clean_text(rng, lang)
        elif cls == "boilerplate":
            bp = _host_boilerplate(host)
            body = _clean_text(rng, "en", 20, 80)
            text = bp + "\n" + body + "\n" + bp
        elif cls == "dup" and clean_pool:
            src = int(clean_pool[int(rng.randint(0, len(clean_pool)))])
            text = texts[src]
            if rng.rand() < 0.5:  # near-dup: replace one word
                words = text.split(" ")
                if len(words) > 3:
                    words[int(rng.randint(1, len(words) - 1))] = "altered"
                    text = " ".join(words)
        elif cls == "pii":
            base = _clean_text(rng, "en")
            words = base.split(" ")
            for frag in _pii_fragments(rng):
                pos = int(rng.randint(0, len(words) + 1))
                words.insert(pos, frag)
            text = " ".join(words)
        elif cls == "tox":
            base = _clean_text(rng, "en", 20, 100)
            words = base.split(" ")
            for _ in range(int(rng.randint(1, 4))):
                pos = int(rng.randint(0, len(words) + 1))
                words.insert(pos, str(rng.choice(TOX_WORDS)))
            text = " ".join(words)
        elif cls == "junk":
            text = _junk_text(rng, int(rng.randint(0, 5)))
        elif cls == "degenerate":
            kind = degenerate_cycle % 6
            degenerate_cycle += 1
            if kind == 0:
                text = ""
            elif kind == 1:
                text = "a"
            elif kind == 2:
                text = "before\x00after nul byte"
            elif kind == 3:
                text = "emoji soup 🎉🚀🌍 " + _clean_text(rng, "en", 10, 30)
            elif kind == 4 and urls:
                url = urls[int(rng.randint(0, len(urls)))]  # duplicate url
                text = _clean_text(rng, "en", 10, 40)
            else:
                text = " ".join(
                    rng.choice(LANG_VOCAB["en"], size=max(big_doc_chars // 6, 10))
                )
        else:  # dup with empty pool degrades to clean
            text = _clean_text(rng, "en")
            cls = "clean_en"
            clean_pool.append(i)
        texts.append(text)
        langs.append(lang)
        urls.append(url)
        actual_cls.append(cls)

    htmls: list[bytes] = []
    bad_enc = rng.rand(n_rows) < 0.02
    for i, text in enumerate(texts):
        body = text.encode("utf-8")
        page = b"<html><head><title>p</title></head><body>" + body + b"</body></html>"
        if bad_enc[i]:
            page = page[: len(page) // 2] + b"\xff\xfe" + page[len(page) // 2 :]
        htmls.append(page)

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts).dt.floor("s"),
            "html": htmls,
            "text": texts,
            "lang": langs,
            "cls": actual_cls,
        }
    )
