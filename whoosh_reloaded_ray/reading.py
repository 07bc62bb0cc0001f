"""Alias module (reference import path whoosh.reading)."""
from .compat import Reader as IndexReader  # noqa: F401
from .compat import TermInfo  # noqa: F401
