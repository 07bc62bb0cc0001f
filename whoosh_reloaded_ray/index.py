"""Alias module (reference import path whoosh.index)."""
from .compat import (  # noqa: F401
    EmptyIndexError, Index, LockError, create_in, exists_in, open_dir,
)
