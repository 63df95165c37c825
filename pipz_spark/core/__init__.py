from .errors import (
    ERROR_COL,
    ERROR_SCHEMA,
    ensure_error_column,
    error_path_str,
    is_failed,
    is_ok,
    make_error,
    null_error,
    split_failed,
    split_ok,
)
from .identity import Identity
from .step import Step, identity_step

__all__ = [
    "ERROR_COL",
    "ERROR_SCHEMA",
    "Identity",
    "Step",
    "ensure_error_column",
    "error_path_str",
    "identity_step",
    "is_failed",
    "is_ok",
    "make_error",
    "null_error",
    "split_failed",
    "split_ok",
]
