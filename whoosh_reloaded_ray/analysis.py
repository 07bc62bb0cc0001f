"""Alias module (reference import path whoosh.analysis)."""
from .compat import (  # noqa: F401
    BiWordFilter, CharsetFilter, CommaSeparatedTokenizer,
    CompositionError, CompoundWordFilter, DelimitedAttributeFilter,
    DoubleMetaphoneFilter, FancyAnalyzer, IDAnalyzer, IDTokenizer,
    KeywordAnalyzer, LanguageAnalyzer, LoggingFilter, LowercaseFilter,
    NgramAnalyzer, NgramFilter, NgramTokenizer, NgramWordAnalyzer,
    PassFilter, PyStemmerFilter, RegexAnalyzer, RegexTokenizer,
    ReverseTextFilter, ShingleFilter, SimpleAnalyzer,
    SpaceSeparatedTokenizer, StandardAnalyzer, StemFilter,
    StemmingAnalyzer, StopFilter, StripFilter, SubstitutionFilter,
)
from .functions.analysis import STOP_WORDS  # noqa: F401
