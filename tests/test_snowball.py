"""Differential parity of the clean-room Snowball stemmers vs the
reference transcriptions (ref lang/snowball/*), over biased random
pseudo-words (suffix-seeded so the rule branches actually fire) plus
alphabet-uniform noise."""

from __future__ import annotations

import random

import pytest

from whoosh_reloaded_ray.functions import snowball

ALPHABETS = {
    "da": "abcdefghijklmnopqrstuvwxyzæøå",
    "no": "abcdefghijklmnopqrstuvwxyzæøå",
    "sv": "abcdefghijklmnopqrstuvwxyzäåö",
    "de": "abcdefghijklmnopqrstuvwxyzäöüß",
    "nl": "abcdefghijklmnopqrstuvwxyzàèéëïî",
    "fr": "abcdefghijklmnopqrstuvwxyzâàçëéêèïîôûùü",
    "es": "abcdefghijklmnopqrstuvwxyzáéíóúüñ",
    "it": "abcdefghijklmnopqrstuvwxyzàèéìíîòóùú",
    "pt": "abcdefghijklmnopqrstuvwxyzãõáéíóúâêôçàü",
    "ro": "abcdefghijklmnopqrstuvwxyzăâîșşțţ",
    "ru": "абвгдеёжзийклмнопрстуфхцчшщъыьэюя",
    "fi": "abcdefghijklmnopqrstuvwxyzäö",
    "hu": "abcdefghijklmnopqrstuvwxyzáéíóöőüúű",
}

SUFFIXES = {
    "da": ["hed", "erede", "erende", "heden", "endes", "igst", "løst", "elig", "els", "en", "es", "et", "e", "s", "gd", "dt", "kendelse"],
    "no": ["hetene", "hetens", "endes", "ande", "ende", "erte", "ert", "ene", "ens", "het", "ast", "en", "ar", "es", "et", "dt", "vt", "eleg", "eig", "elig", "els", "hetslov", "s"],
    "sv": ["heterna", "anden", "arnas", "andes", "arna", "aste", "ande", "ade", "are", "het", "ast", "en", "ar", "or", "at", "a", "e", "s", "dd", "gt", "tt", "fullt", "löst", "lig", "els", "ig"],
    "de": ["ern", "em", "er", "en", "es", "e", "s", "est", "st", "end", "ung", "igung", "isch", "ik", "ig", "lich", "heit", "keit", "lichkeit", "igkeit", "niss", "ss", "ß"],
    "nl": ["heden", "ene", "en", "se", "s", "e", "heid", "end", "ing", "ig", "lijk", "baar", "bar", "kke", "tte", "aat", "oot", "gem", "cheid", "iging", "y", "i", "iy", "ïy"],
    "es": ["selas", "iéndo", "ándo", "ando", "ar", "uyendo", "anza", "ico", "ismo", "able", "ista", "oso", "amiento", "ador", "ación", "ante", "logía", "ución", "encia", "amente", "mente", "idad", "iva", "ya", "yeron", "en", "éis", "emos", "arían", "iésemos", "ábamos", "aba", "ía", "ase", "iste", "aron", "ido", "ió", "ís", "os", "á", "é", "gue"],
    "it": ["gliela", "sene", "velo", "gli", "ando", "endo", "arla", "amente", "icamente", "anza", "iche", "ismo", "abile", "ista", "mente", "atrice", "azione", "logia", "uzione", "enza", "amento", "ità", "ivo", "erebbero", "iscono", "iamo", "ato", "erà", "uto", "à", "ò", "chi", "ghe", "cchio", "qu"],
    "pt": ["eza", "ismo", "ável", "ista", "amento", "adora", "ação", "ções", "ância", "logia", "ução", "ência", "amente", "mente", "idade", "iva", "eira", "aríamos", "asse", "aram", "ando", "ada", "ava", "ia", "am", "ar", "eu", "os", "á", "ê", "ç", "ão", "ões"],
    "ru": ["ившись", "вшись", "вши", "ав", "яв", "ив", "в", "ся", "сь", "ейше", "ость", "нн", "ться", "ется", "лся", "ующий", "щий", "вший", "емый", "нный", "уйте", "ите", "или", "ила", "ена", "ует", "уют", "ить", "ишь", "ят", "ую", "ла", "ли", "ем", "ло", "ет", "ют", "ть", "ешь", "й", "л", "н", "ю", "иями", "ями", "ами", "ией", "иях", "ов", "ие", "ье", "ии", "ей", "ий", "ям", "ам", "ом", "ах", "ью", "ия", "ья", "ими", "ыми", "ого", "ому", "их", "ая", "ое", "ый", "им", "а", "е", "и", "о", "у", "ы", "ь", "я"],
    "fr": ["issement", "atrice", "ations", "logie", "usion", "ution", "ences", "ement", "euses", "ments", "ance", "ique", "isme", "able", "iste", "ence", "ités", "ives", "eaux", "euse", "ment", "eux", "ité", "ive", "ifs", "aux", "if", "issaient", "issante", "issions", "issant", "issent", "irons", "isses", "îmes", "irai", "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i", "eraient", "assions", "assent", "èrent", "erais", "eriez", "eront", "aient", "antes", "ions", "erai", "erez", "âmes", "ante", "asse", "ées", "era", "iez", "ais", "ait", "ant", "ée", "és", "er", "ez", "ât", "ai", "as", "é", "a", "ière", "tion", "sion", "ier", "e", "s", "guë", "enne", "onne", "ette", "elle", "eille", "qu", "èrement"],
    "fi": ["kaan", "kään", "sti", "kin", "han", "hän", "ko", "kö", "pa", "pä", "nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en", "siin", "tten", "seen", "hin", "hon", "den", "tta", "ttä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle", "ksi", "ine", "ta", "tä", "na", "nä", "a", "ä", "n", "impi", "impa", "immi", "imma", "mpi", "mpa", "mmi", "mma", "eja", "ejä", "it", "at", "ät", "ija", "oj", "uj", "jo", "aa", "ee", "ii", "uu", "ää", "kk", "ll", "tt", "nn"],
    "hu": ["astul", "estül", "stul", "stül", "ástul", "éstül", "képpen", "onként", "enként", "anként", "ánként", "képp", "ként", "ban", "ben", "nak", "nek", "val", "vel", "tól", "hoz", "hez", "höz", "nál", "nél", "ért", "kor", "ba", "be", "ra", "re", "ig", "at", "et", "ot", "öt", "ul", "ül", "vá", "vé", "en", "on", "an", "ön", "n", "t", "án", "én", "á", "é", "oké", "öké", "aké", "eké", "áké", "áéi", "éké", "ééi", "ké", "éi", "éé", "ájuk", "éjük", "ünk", "unk", "juk", "jük", "ánk", "énk", "nk", "uk", "ük", "em", "om", "am", "od", "ed", "ad", "öd", "ja", "je", "ám", "ád", "ém", "éd", "m", "d", "a", "e", "o", "jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek", "áink", "éink", "jai", "jei", "ink", "aik", "eik", "im", "id", "ai", "ei", "ik", "ái", "éi", "i", "ák", "ék", "ök", "ok", "ek", "ak", "k", "sszal", "ttel", "bbal", "ggyel", "sszá", "ttá"],
    "ro": ["abilităţi", "ivităţi", "icităţi", "ităţi", "işti", "oşi", "aţie", "aţia", "aţiune", "iţiune", "eşti", "eşte", "aţi", "eţi", "iţi", "abilitate", "ibilitate", "icitate", "ătoare", "atoare", "ativa", "ativă", "iciva", "icale", "atori", "ator", "itoare", "itori", "itor", "ele", "ea", "ei", "iua", "ilor", "ul", "ului", "uri", "elor", "iilor", "ii", "iei", "ie", "ia", "ata", "ată", "ati", "ate", "uta", "ută", "ita", "ită", "ica", "ice", "ici", "ică", "abila", "abile", "anta", "ante", "ista", "iste", "ut", "it", "at", "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze", "ează", "esc", "ăsc", "eam", "eau", "iam", "iau", "ui", "arăm", "urăm", "irăm", "ase", "use", "ise", "âse", "seserăţi", "serăm", "sese", "a", "e", "i", "ă"],
}


def gen_words(lang: str, n: int, seed: int = 11):
    rng = random.Random(seed)
    alpha = ALPHABETS[lang]
    bias = SUFFIXES.get(lang, [])
    out = []
    for _ in range(n):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
        if bias and rng.random() < 0.7:
            w = w[: rng.randint(0, len(w))] + rng.choice(bias)
        out.append(w)
    return out


IMPLEMENTED = [lang for lang in ALPHABETS if snowball.stemmer_for(lang) is not None]


@pytest.mark.parametrize("lang", IMPLEMENTED)
def test_snowball_parity(whoosh, lang):
    from whoosh.lang.snowball import classes

    ref = classes[lang]().stem
    ours = snowball.stemmer_for(lang)
    bad = []
    for w in gen_words(lang, 20_000):
        r = ref(w)
        o = ours(w)
        if o != r:
            bad.append((w, r, o))
    assert not bad, bad[:10]


def test_registry_subset_of_reference(whoosh):
    from whoosh.lang.snowball import classes

    for lang in snowball.available_languages():
        assert lang in classes


def test_cached_stemmer():
    fn = snowball.cached_stemmer_for("da")
    assert fn("kendelse") == fn("kendelse") == "kend"


def test_isri_parity(whoosh):
    """Arabic ISRI stemmer parity vs the reference transcription
    (ref lang/isri.py), over biased random Arabic pseudo-words with
    diacritics and hamza forms."""
    import random

    from whoosh.lang.isri import ISRIStemmer

    from whoosh_reloaded_ray.functions.isri import stem as ours

    ref = ISRIStemmer().stem
    alpha = "ابتثجحخدذرزسشصضطظعغفقكلمنهويةءآأإؤئًٌٍَُِّْ"
    bias = ["كال", "بال", "ولل", "وال", "ال", "لل", "تمل", "تان",
            "تين", "ون", "ات", "ان", "ين", "نا", "ها", "تم", "ني",
            "وا", "هم", "ة", "ه", "ي", "ت", "ا", "ن", "است", "مست",
            "مت", "وو"]
    rng = random.Random(13)
    bad = []
    for _ in range(20_000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
        if rng.random() < 0.7:
            w = (rng.choice(bias) + w) if rng.random() < 0.5 else (w + rng.choice(bias))
        r = ref(w)
        o = ours(w)
        if o != r:
            bad.append((w, r, o))
    assert not bad, bad[:10]


def test_arabic_language_analyzer(whoosh):
    from whoosh.analysis import LanguageAnalyzer

    from whoosh_reloaded_ray.functions.analysis import language_analyzer, make_analyzer

    text = "الكتاب المدرسية للطلاب يتعلمون القراءة والكتابة"
    ours = [w for w, _ in make_analyzer(language_analyzer("ar"))(text)]
    ref = [t.text for t in LanguageAnalyzer("ar")(text)]
    assert ours == ref
