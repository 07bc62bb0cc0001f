"""Alias module (reference import path whoosh.lang.porter)."""
from ..functions.analysis import _porter_stem_cached as _p


def stem(word: str) -> str:
    return _p()(word)
