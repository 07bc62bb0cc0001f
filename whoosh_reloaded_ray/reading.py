"""Alias module (reference import path whoosh.reading)."""
from .compat import EmptyReader  # noqa: F401
from .compat import Reader as IndexReader  # noqa: F401
from .compat import TermCursor, TermInfo  # noqa: F401
