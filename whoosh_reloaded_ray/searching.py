"""Alias module (reference import path whoosh.searching)."""
from .compat import (  # noqa: F401
    CompatSearcher as Searcher,
    Hit,
    Results,
    ResultsPage,
    TermInfo,
)
