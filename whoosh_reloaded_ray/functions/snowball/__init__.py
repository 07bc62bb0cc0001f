"""Pure-Python Snowball stemmers, implemented clean-room from the
published algorithm descriptions at snowballstem.org (public domain
algorithm specs), behavior-converged against the reference's
transcriptions (ref ``lang/snowball/*``) by differential fuzzing — see
tests/test_snowball.py.  Deviations the fuzzer surfaced between the
published spec and the reference's transcription are replicated and
commented per language (the REFERENCE is the parity target).

Registry mirrors ref ``lang/snowball/__init__.py`` two-letter codes.
"""

from __future__ import annotations

from functools import lru_cache
from importlib import import_module

_LANG_MODULES = {
    "da": "danish",
    "nl": "dutch",
    "fi": "finnish",
    "fr": "french",
    "de": "german",
    "hu": "hungarian",
    "it": "italian",
    "no": "norwegian",
    "pt": "portuguese",
    "ro": "romanian",
    "ru": "russian",
    "es": "spanish",
    "sv": "swedish",
}


def available_languages():
    return sorted(lang for lang in _LANG_MODULES if stemmer_for(lang) is not None)


@lru_cache(maxsize=None)
def stemmer_for(lang: str):
    """Raw stem function for a two-letter language code, or None."""
    mod = _LANG_MODULES.get(lang)
    if mod is None:
        return None
    try:
        m = import_module(f".{mod}", __name__)
    except ImportError:
        return None
    return m.stem


@lru_cache(maxsize=None)
def cached_stemmer_for(lang: str, cachesize: int = 50000):
    """LRU-cached stem function (the reference StemFilter's
    cachesize=50000 per-worker cache)."""
    fn = stemmer_for(lang)
    if fn is None:
        return None
    return lru_cache(maxsize=cachesize)(fn)


class SnowballStem:
    """Picklable per-language stem callable: ships only the language
    code to Ray workers and rebuilds the per-worker LRU on first call
    (a bare lru_cache wrapper around a module function does not
    pickle)."""

    __slots__ = ("lang", "_fn")

    def __init__(self, lang: str):
        self.lang = lang
        self._fn = None

    def __call__(self, word: str) -> str:
        fn = self._fn
        if fn is None:
            fn = self._fn = cached_stemmer_for(self.lang)
        return fn(word)

    def __reduce__(self):
        return (SnowballStem, (self.lang,))
