"""Alias module (reference import path whoosh.highlight)."""
from .query.highlight import (  # noqa: F401
    FIRST, LONGER, SHORTER, ContextFragmenter, Formatter, Fragment,
    GenshiFormatter, HtmlFormatter, NullFormatter, PinpointFragmenter,
    SentenceFragmenter, Token, UppercaseFormatter, WholeFragmenter,
    basic_fragment_score, highlight, top_fragments,
)
from .query.highlight import SCORE, Highlighter  # noqa: F401
