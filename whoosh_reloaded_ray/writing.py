"""Alias module (reference import path whoosh.writing)."""
from .compat import (  # noqa: F401
    CLEAR, MERGE_SMALL, NO_MERGE, OPTIMIZE, AsyncWriter, BatchWriter,
    BufferedWriter, IndexingError, LockError, Writer,
)

IndexWriter = Writer  # reference base-class name
