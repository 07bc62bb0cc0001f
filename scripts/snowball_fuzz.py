"""Differential fuzz of our snowball stemmers vs the reference
transcriptions.  Usage: python scripts/snowball_fuzz.py <lang> [n]
Prints mismatches (word, ref, ours); exit 0 when none."""

from __future__ import annotations

import functools
import random
import sys
import types

sys.path.insert(0, "/root/repo")
if "cached_property" not in sys.modules:
    m = types.ModuleType("cached_property")
    m.cached_property = functools.cached_property
    sys.modules["cached_property"] = m
sys.path.insert(0, "/root/reference/src")

ALPHABETS = {
    "da": "abcdefghijklmnopqrstuvwxyzæøå",
    "no": "abcdefghijklmnopqrstuvwxyzæøå",
    "sv": "abcdefghijklmnopqrstuvwxyzäåö",
    "de": "abcdefghijklmnopqrstuvwxyzäöüß",
    "nl": "abcdefghijklmnopqrstuvwxyzàèéëïî",
    "fr": "abcdefghijklmnopqrstuvwxyzâàçëéêèïîôûùüœ",
    "es": "abcdefghijklmnopqrstuvwxyzáéíóúüñ",
    "it": "abcdefghijklmnopqrstuvwxyzàèéìíîòóùú",
    "pt": "abcdefghijklmnopqrstuvwxyzãõáéíóúâêôçàü",
    "ro": "abcdefghijklmnopqrstuvwxyzăâîșşțţ",
    "ru": "абвгдеёжзийклмнопрстуфхцчшщъыьэюя",
    "fi": "abcdefghijklmnopqrstuvwxyzäö",
    "hu": "abcdefghijklmnopqrstuvwxyzáéíóöőüúű",
}

# common suffixes per language to bias generation toward rule-triggering
# words (uniform random strings rarely end in interesting suffixes)
SUFFIX_BIAS = {
    "da": ["hed", "ethed", "erede", "erende", "heden", "eren", "heder", "erer", "endes", "ernes", "hedens", "erens", "erets", "eret", "igst", "løst", "elig", "lig", "els", "ig", "en", "er", "es", "et", "e", "s", "gd", "dt", "gt", "kt", "erendes"],
    "no": ["hetene", "hetens", "heter", "heten", "endes", "ande", "ende", "edes", "enes", "erte", "ede", "ane", "ene", "ens", "ers", "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et", "e", "s", "dt", "vt", "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov", "slov", "hetslov"],
    "sv": ["heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas", "ornas", "andes", "arens", "andet", "arna", "erna", "orna", "ande", "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens", "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e", "s", "dd", "gd", "nn", "dt", "gt", "kt", "tt", "lig", "els", "fullt", "löst", "ig"],
}


def gen_words(lang: str, n: int, seed: int = 7):
    rng = random.Random(seed)
    alpha = ALPHABETS[lang]
    bias = SUFFIX_BIAS.get(lang, [])
    out = []
    for _ in range(n):
        L = rng.randint(1, 9)
        w = "".join(rng.choice(alpha) for _ in range(L))
        if bias and rng.random() < 0.7:
            w = w[: rng.randint(0, len(w))] + rng.choice(bias)
        out.append(w)
    return out


def main():
    lang = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    from whoosh.lang.snowball import classes

    ref = classes[lang]().stem
    import importlib

    from whoosh_reloaded_ray.functions import snowball as ours_pkg

    ours = ours_pkg.stemmer_for(lang)
    if ours is None:
        print(f"no local stemmer for {lang}")
        sys.exit(2)
    bad = 0
    for w in gen_words(lang, n):
        try:
            r = ref(w)
        except Exception as exc:
            r = f"<ref raised {type(exc).__name__}>"
        o = ours(w)
        if o != r:
            bad += 1
            if bad <= 25:
                print(f"MISMATCH {w!r}: ref={r!r} ours={o!r}")
    print(f"{lang}: {n} words, {bad} mismatches")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
