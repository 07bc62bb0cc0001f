"""Alias module (reference import path whoosh.sorting)."""
from .compat import (  # noqa: F401
    Best, Count, DateRangeFacet, FacetMap, Facets, FieldFacet,
    FunctionFacet, MultiFacet, OrderedList, QueryFacet, RangeFacet,
    ScoreFacet, StoredFieldFacet, TranslateFacet, UnorderedList,
)
