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
    "hu": "abcdefghijklmnopqrstuvwxyzáéíóöőüúűõû",
    # Arabic letters + short-vowel diacritics + hamza forms for ISRI
    "ar": "ابتثجحخدذرزسشصضطظعغفقكلمنهويةءآأإؤئًٌٍَُِّْ",
}

# common suffixes per language to bias generation toward rule-triggering
# words (uniform random strings rarely end in interesting suffixes)
SUFFIX_BIAS = {
    "da": ["hed", "ethed", "erede", "erende", "heden", "eren", "heder", "erer", "endes", "ernes", "hedens", "erens", "erets", "eret", "igst", "løst", "elig", "lig", "els", "ig", "en", "er", "es", "et", "e", "s", "gd", "dt", "gt", "kt", "erendes"],
    "no": ["hetene", "hetens", "heter", "heten", "endes", "ande", "ende", "edes", "enes", "erte", "ede", "ane", "ene", "ens", "ers", "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et", "e", "s", "dt", "vt", "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov", "slov", "hetslov"],
    "sv": ["heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas", "ornas", "andes", "arens", "andet", "arna", "erna", "orna", "ande", "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens", "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e", "s", "dd", "gd", "nn", "dt", "gt", "kt", "tt", "lig", "els", "fullt", "löst", "ig"],
    "ru": ["ившись", "ывшись", "вшись", "ивши", "вши", "ав", "яв", "ив", "ыв", "в", "ся", "сь", "ейше", "ейш", "ость", "ост", "нн", "ться", "ется", "ются", "лся", "лась", "ующий", "ующая", "ующую", "ающий", "щий", "вший", "емый", "нный", "уйте", "ейте", "ите", "или", "ыли", "ила", "ыла", "ена", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ят", "ит", "ыт", "ую", "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть", "ешь", "й", "л", "н", "ю", "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья", "ими", "ыми", "его", "ого", "ему", "ому", "их", "ых", "ая", "яя", "ою", "ею", "ее", "ые", "ое", "ый", "им", "ым", "а", "е", "и", "о", "у", "ы", "ь", "я"],
    "fr": ["issements", "issement", "atrice", "ateurs", "ations", "logies", "usions", "utions", "ements", "amment", "emment", "ances", "iques", "ismes", "ables", "istes", "ateur", "ation", "logie", "usion", "ution", "ences", "ement", "euses", "ments", "ance", "ique", "isme", "able", "iste", "ence", "ités", "ives", "eaux", "euse", "ment", "eux", "ité", "ive", "ifs", "aux", "if", "issaient", "issantes", "iraient", "issante", "issions", "irions", "issais", "issant", "issent", "issons", "irais", "irent", "irons", "iront", "isses", "issez", "îmes", "îtes", "irai", "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i", "eraient", "assions", "erions", "assent", "assiez", "èrent", "erais", "erait", "eriez", "erons", "eront", "aient", "antes", "asses", "ions", "erai", "eras", "erez", "âmes", "âtes", "ante", "ants", "asse", "ées", "era", "iez", "ais", "ait", "ant", "ée", "és", "er", "ez", "ât", "ai", "as", "é", "a", "ière", "ions", "tion", "sion", "ier", "e", "s", "gus", "guë", "enne", "onne", "ette", "elle", "eille", "ying", "quu", "qu", "éments", "èrement"],
    "fi": ["kään", "kaan", "hän", "han", "kin", "ko", "kö", "pä", "pa", "nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle", "lna", "lnä", "ksi", "ine", "tta", "ttä", "ta", "tä", "a", "ä", "n", "han", "seen", "siin", "den", "tten", "impi", "impa", "immi", "imma", "eja", "ejä", "mpi", "mpa", "mmi", "mma", "eia", "eiä", "oma", "ima", "poikkeus", "t", "ut", "yt", "ija", "ijä", "itse", "ke", "ine", "oj", "uk", "uu", "yy", "ää", "öö", "ii", "aa", "ee", "oo"],
    "hu": ["astul", "estül", "stul", "stül", "astól", "estõl", "ástól", "éstül", "tól", "tõl", "rõl", "bõl", "képpen", "onként", "enként", "anként", "ánként", "sszal", "ttel", "ggyel", "bbal", "llel", "nnal", "sszá", "ttá", "ggyé", "áké", "ééi", "éé", "ájuk", "éjük", "jaitok", "jeitek", "áitok", "éitek", "áink", "éink", "ái", "éi", "ák", "ék", "ul", "ül", "ba", "be", "ban", "ben", "ból", "ből", "nak", "nek", "val", "vel", "tól", "ra", "re", "ről", "ban", "hoz", "hez", "höz", "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen", "kor", "uk", "ük", "juk", "jük", "unk", "ünk", "nk", "áké", "éké", "ké", "éi", "é", "ánk", "énk", "ájé", "ák", "ék", "ök", "ok", "ek", "ak", "k", "ája", "éje", "ja", "je", "a", "e", "o", "á", "é", "i", "an", "en", "on", "ön", "lan", "len", "bb", "obb", "abb", "ebb", "astul", "itt"],
    "ar": ["كال", "بال", "ولل", "وال", "ال", "لل", "تمل", "همل", "تان", "تين", "كمل", "ون", "ات", "ان", "ين", "تن", "كم", "هن", "نا", "ها", "تم", "ني", "وا", "هم", "ة", "ه", "ي", "ت", "ا", "ن", "است", "مست", "مت", "وو"],
    "ro": ["abilităţi", "ivităţi", "icităţi", "ităţi", "işti", "oşi", "aţie", "aţia", "aţiune", "iţiune", "seserăţi", "aserăţi", "serăţi", "seseşi", "arăţi", "aseşi", "aseră", "eşti", "eşte", "ăşti", "ăşte", "eaţi", "iaţi", "aşi", "uşi", "işi", "âşi", "aţi", "eţi", "iţi", "âţi", "ţiune", "ţiuni", "abilitate", "abilitati", "abilităi", "abilități", "ibilitate", "icitate", "icitati", "icităi", "icități", "ătoare", "atoare", "ativa", "ative", "ativi", "ativă", "iciva", "icive", "icivi", "icivă", "atori", "ator", "itoare", "itori", "itor", "ăreasa", "ărease", "easa", "ele", "ea", "ei", "eie", "iua", "ilor", "ul", "ului", "ur", "uri", "ului", "elor", "iilor", "ii", "iei", "ie", "ia", "ata", "ată", "ati", "ate", "uta", "ută", "uti", "ute", "ita", "ită", "iti", "ite", "ica", "ice", "ici", "ică", "abila", "abile", "abili", "abilă", "ibila", "anta", "ante", "anti", "antă", "ista", "iste", "isti", "istă", "ut", "it", "at", "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze", "ească", "ez", "ezi", "ează", "esc", "ești", "ește", "ăsc", "ăști", "ăște", "am", "ai", "au", "eam", "eai", "eau", "iam", "iai", "iau", "ui", "ași", "arăm", "urăm", "irăm", "âși", "ârăm", "ase", "use", "ise", "âse", "a", "e", "i", "ă", "ie"],
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
    if lang == "ar":
        from whoosh.lang.isri import ISRIStemmer

        ref = ISRIStemmer().stem
    else:
        from whoosh.lang.snowball import classes

        ref = classes[lang]().stem
    import importlib

    if lang == "ar":
        from whoosh_reloaded_ray.functions.isri import stem as ours
    else:
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
