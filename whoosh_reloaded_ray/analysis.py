"""Alias module (reference import path whoosh.analysis)."""
from .compat import (  # noqa: F401
    Analyzer, BiWordFilter, CharsetFilter, CharsetTokenizer,
    CommaSeparatedTokenizer, Composable, CompositeAnalyzer,
    CompositionError, CompoundWordFilter, DelimitedAttributeFilter,
    DoubleMetaphoneFilter, FancyAnalyzer, Filter, IDAnalyzer, IDTokenizer,
    IntraWordFilter, KeywordAnalyzer, LanguageAnalyzer, LoggingFilter,
    LowercaseFilter, MultiFilter, NgramAnalyzer, NgramFilter,
    NgramTokenizer, NgramWordAnalyzer, PassFilter, PathTokenizer,
    PyStemmerFilter, RegexAnalyzer, RegexTokenizer, ReverseTextFilter,
    ShingleFilter, SimpleAnalyzer, SpaceSeparatedTokenizer,
    StandardAnalyzer, StemFilter, StemmingAnalyzer, StopFilter,
    StripFilter, SubstitutionFilter, TeeFilter, Token, Tokenizer,
    default_pattern, url_pattern,
)
from .functions.analysis import STOP_WORDS  # noqa: F401
