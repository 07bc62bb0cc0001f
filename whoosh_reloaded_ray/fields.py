"""Alias module (reference import path whoosh.fields)."""
from .compat import (  # noqa: F401
    BOOLEAN, COLUMN, DATETIME, ID, IDLIST, KEYWORD, NGRAM, NGRAMWORDS,
    NUMERIC, STORED, TEXT, FieldConfigurationError, MetaSchema, Schema,
    SchemaClass, UnknownFieldError,
)
from .schema import FieldSpec, IndexSchema  # noqa: F401
