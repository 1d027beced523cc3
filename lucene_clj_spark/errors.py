"""Typed exceptions mirroring the reference's ex-info contracts.

The reference raises `ex-info` with structured data for every documented
precondition (reference validation.clj:9-86, schema.clj:93-109,
values.clj:22-24,118-119, field_types.clj:108-115). We mirror the trigger
conditions with typed exceptions carrying a `.data` dict.
"""

from __future__ import annotations

from typing import Any


class LuceneSparkError(Exception):
    """Base error; carries structured `.data` like Clojure's ex-info."""

    def __init__(self, message: str, data: dict[str, Any] | None = None):
        super().__init__(message)
        self.data = data or {}


class SchemaError(LuceneSparkError):
    """Invalid field-spec schema (reference schema.clj:93-109)."""


class ValidationError(LuceneSparkError):
    """Invalid create/index/search/suggest options
    (reference validation.clj:9-86)."""


class ValueTypeError(LuceneSparkError):
    """Scalar value fails type normalization
    (reference values.clj:19-132)."""


class CardinalityError(LuceneSparkError):
    """Multi-value given to a single-valued field or vice versa
    (reference field_types.clj:108-115)."""


class UnknownFieldError(LuceneSparkError):
    """Document contains a field not in the schema
    (reference document.clj:85-90)."""
