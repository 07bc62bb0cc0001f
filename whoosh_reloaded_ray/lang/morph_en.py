"""Alias module (reference import path whoosh.lang.morph_en)."""
from ..functions.morph_en import variations  # noqa: F401
