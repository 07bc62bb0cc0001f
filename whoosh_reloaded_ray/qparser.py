"""Alias module (reference import path whoosh.qparser): parsers + the
Plugin API (reference qparser/plugins.py) + custom-plugin syntax nodes."""
from .query.parser import (  # noqa: F401
    DisMaxParser, MultifieldParser, QueryParser, SimpleParser,
)
from .query import plugins  # noqa: F401
from .query.plugins import (  # noqa: F401
    AndGroup,
    AndMaybeGroup,
    BoostPlugin,
    CopyFieldPlugin,
    DateParserPlugin,
    EveryPlugin,
    FieldAliasPlugin,
    FieldsPlugin,
    FuzzyTermPlugin,
    GroupNode,
    GroupPlugin,
    GtLtPlugin,
    OperatorsPlugin,
    OrGroup,
    PhrasePlugin,
    Plugin,
    PrefixPlugin,
    PseudoFieldPlugin,
    RangePlugin,
    RegexPlugin,
    RegexTagger,
    RequireGroup,
    SingleQuotePlugin,
    TaggingPlugin,
    WhitespacePlugin,
    WildcardPlugin,
    WordNode,
)
