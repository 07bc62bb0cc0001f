"""Alias module (reference import path whoosh.spelling)."""
from .query.suggest import (  # noqa: F401
    ListCorrector,
    MultiCorrector,
    ReaderCorrector,
    levenshtein,
    levenshtein_within,
)
