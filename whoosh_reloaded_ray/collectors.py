"""Alias module (reference import path whoosh.collectors; this engine's
user-collector surface is the VectorCollector segment-partial protocol,
plus the reference-style CollapseCollector wrapper over
Searcher.collector() handles)."""
from .compat import CollapseCollector, CollectorSpec  # noqa: F401
from .query.collectors import (  # noqa: F401
    CountCollector, FieldValuesCollector, StatsCollector,
    TopFieldCollector, VectorCollector,
)
