"""Alias module (reference import path whoosh.classify)."""
from .query.expand import Bo1Model, Bo2Model, KLModel  # noqa: F401
