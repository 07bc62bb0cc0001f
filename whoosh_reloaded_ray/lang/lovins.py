"""Alias module (reference import path whoosh.lang.lovins)."""
from ..functions.lovins import lovins_stem as stem  # noqa: F401
