"""Alias module (reference import path whoosh.lang.dmetaphone)."""
from ..functions.dmetaphone import double_metaphone  # noqa: F401
