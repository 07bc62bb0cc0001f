"""Alias module (reference import path whoosh.classify)."""
from .query.expand import (  # noqa: F401
    Bo1Model,
    Bo2Model,
    Expander,
    KLModel,
    key_terms,
    key_terms_from_text,
    more_like,
)
