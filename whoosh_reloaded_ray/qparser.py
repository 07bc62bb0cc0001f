"""Alias module (reference import path whoosh.qparser)."""
from .query.parser import (  # noqa: F401
    DisMaxParser, MultifieldParser, QueryParser, SimpleParser,
)
