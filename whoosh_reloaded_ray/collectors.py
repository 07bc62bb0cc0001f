"""Alias module (reference import path whoosh.collectors; this engine's
user-collector surface is the VectorCollector segment-partial protocol)."""
from .query.collectors import (  # noqa: F401
    CountCollector, FieldValuesCollector, StatsCollector,
    TopFieldCollector, VectorCollector,
)
