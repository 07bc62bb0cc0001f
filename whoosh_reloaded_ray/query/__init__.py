from .ast import (  # noqa: F401
    And,
    AndMaybe,
    AndNot,
    ColumnQuery,
    ConstantScoreQuery,
    DisMax,
    Every,
    FuzzyTerm,
    Not,
    NumericRange,
    Or,
    Phrase,
    Prefix,
    Query,
    Require,
    Sequence,
    Term,
    TermRange,
    Wildcard,
)
from .ast import ConstantTerms  # noqa: F401
from .parser import QueryParser  # noqa: F401
