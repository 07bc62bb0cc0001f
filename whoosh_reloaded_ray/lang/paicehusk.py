"""Alias module (reference import path whoosh.lang.paicehusk)."""
from ..functions.paicehusk import paicehusk_stem as stem  # noqa: F401
