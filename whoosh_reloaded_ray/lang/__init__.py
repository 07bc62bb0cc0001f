"""Language registry (reference whoosh/lang/__init__.py surface):
language-name/alias resolution plus stemmer/stopword lookups, backed by
this package's clean-room stemmers (functions/porter*, functions/snowball,
functions/isri) and stoplists (functions/lang_stopwords)."""

from __future__ import annotations


class NoStemmer(Exception):
    pass


class NoStopWords(Exception):
    pass


languages = (
    "ar", "da", "nl", "en", "fi", "fr", "de", "hu", "it", "no", "pt",
    "ro", "ru", "es", "sv", "tr",
)

aliases = {
    # ISO 639-2 three-letter codes
    "ara": "ar", "dan": "da", "nld": "nl", "eng": "en", "fin": "fi",
    "fra": "fr", "deu": "de", "hun": "hu", "ita": "it", "nor": "no",
    "por": "pt", "ron": "ro", "rus": "ru", "spa": "es", "swe": "sv",
    "tur": "tr",
    # English names
    "arabic": "ar", "danish": "da", "dutch": "nl", "english": "en",
    "finnish": "fi", "french": "fr", "german": "de", "hungarian": "hu",
    "italian": "it", "norwegian": "no", "portuguese": "pt",
    "romanian": "ro", "russian": "ru", "spanish": "es", "swedish": "sv",
    "turkish": "tr",
    # Native names
    "العربية": "ar", "dansk": "da", "nederlands": "nl", "suomi": "fi",
    "français": "fr", "deutsch": "de", "magyar": "hu", "italiano": "it",
    "norsk": "no", "português": "pt", "русский язык": "ru",
    "español": "es", "svenska": "sv", "türkçe": "tr",
}

# two-letter codes with a snowball transcription in functions/snowball
_SNOWBALL = {"da", "nl", "fi", "fr", "de", "hu", "it", "no", "pt", "ro",
             "ru", "es", "sv"}


def two_letter_code(name: str):
    if name in languages:
        return name
    return aliases.get(name)


def has_stemmer(lang: str) -> bool:
    try:
        return bool(stemmer_for_language(lang))
    except NoStemmer:
        return False


def has_stopwords(lang: str) -> bool:
    try:
        return bool(stopwords_for_language(lang))
    except NoStopWords:
        return False


def stemmer_for_language(lang: str):
    """word -> stem callable for a language code/name/alias."""
    if lang == "en_porter":
        from ..functions.analysis import _porter_stem_cached

        return _porter_stem_cached()
    tlc = two_letter_code(lang)
    if tlc == "en":
        from ..functions.porter2 import porter2_stem_cached

        return porter2_stem_cached
    if tlc == "ar":
        from ..functions.isri import isri_stem_cached

        return isri_stem_cached
    if tlc in _SNOWBALL:
        from ..functions.snowball import SnowballStem

        return SnowballStem(tlc)
    raise NoStemmer(f"No stemmer available for {lang!r}")


def stopwords_for_language(lang: str) -> frozenset:
    from ..functions.lang_stopwords import STOPLISTS

    tlc = two_letter_code(lang)
    if tlc in STOPLISTS:
        return STOPLISTS[tlc]
    raise NoStopWords(f"No stop-word list available for {lang!r}")
