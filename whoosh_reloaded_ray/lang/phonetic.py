"""Alias module (reference import path whoosh.lang.phonetic)."""
from ..functions.phonetic import (  # noqa: F401
    soundex_ar, soundex_en, soundex_esp,
)
