"""Alias module (reference import path whoosh.sorting)."""
from .compat import (  # noqa: F401
    DateRangeFacet, Facets, FieldFacet, FunctionFacet, MultiFacet,
    QueryFacet, RangeFacet, ScoreFacet, StoredFieldFacet, TranslateFacet,
)
