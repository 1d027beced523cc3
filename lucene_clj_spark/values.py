"""Scalar value normalization — mirror of reference values.clj:19-132.

Contract (pinned by reference tests document_test.clj:36-83 and
values_property_test.clj:28-37):

- text fields: strings pass through; keywords/symbols -> their name
  (we accept Enum for that role); char/number/boolean/UUID/datetime/URI
  -> ``str``; ``None`` always raises (values.clj:22-24).
- long: int within 64-bit signed range (values.clj:44-58).
- double: finite float (NaN/inf rejected, values.clj:60-74).
- boolean: bool only.
- instant: datetime/date -> epoch millis (values.clj:76-95).
- nested maps are rejected outright (values.clj:118-119).
- multi-values: list/tuple/set of scalars, only when the field spec says
  multi_valued (field_types.clj:102-115); normalized to a list.
"""

from __future__ import annotations

import datetime as dt
import enum
import math
import uuid
from typing import Any

from lucene_clj_spark.errors import CardinalityError, ValueTypeError

LONG_MIN = -(2**63)
LONG_MAX = 2**63 - 1


def normalize_text(v: Any) -> str:
    if v is None:
        raise ValueTypeError("nil value not allowed for text field", {"value": v})
    if isinstance(v, str):
        return v
    if isinstance(v, enum.Enum):  # Clojure keyword/symbol analogue
        return v.name
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float, uuid.UUID)):
        return str(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, dict):
        raise ValueTypeError("nested maps are not supported", {"value": v})
    raise ValueTypeError(f"cannot normalize {type(v).__name__} to text", {"value": v})


def normalize_keyword(v: Any) -> str:
    return normalize_text(v)


def normalize_long(v: Any) -> int:
    if v is None or isinstance(v, bool) or not isinstance(v, int):
        raise ValueTypeError("long field requires an int", {"value": v})
    if not (LONG_MIN <= v <= LONG_MAX):
        raise ValueTypeError("long out of 64-bit range", {"value": v})
    return v


def normalize_double(v: Any) -> float:
    if v is None or isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ValueTypeError("double field requires a number", {"value": v})
    f = float(v)
    if not math.isfinite(f):
        raise ValueTypeError("double must be finite", {"value": v})
    return f


def normalize_boolean(v: Any) -> bool:
    if not isinstance(v, bool):
        raise ValueTypeError("boolean field requires a bool", {"value": v})
    return v


def normalize_instant(v: Any) -> int:
    """-> epoch millis (reference stores instants as millis longs,
    field_types.clj:81-86)."""
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, dt.date):
        return int(
            dt.datetime(v.year, v.month, v.day, tzinfo=dt.timezone.utc).timestamp()
            * 1000
        )
    if isinstance(v, int) and not isinstance(v, bool):
        return v  # already epoch millis
    raise ValueTypeError("instant field requires datetime/date/epoch-millis", {"value": v})


NORMALIZERS = {
    "text": normalize_text,
    "keyword": normalize_keyword,
    "long": normalize_long,
    "double": normalize_double,
    "boolean": normalize_boolean,
    "instant": normalize_instant,
}


def normalize_value(field_type: str, v: Any, multi_valued: bool = False) -> Any:
    """Normalize one field value per its declared type; enforces
    cardinality (reference field_types.clj:108-115)."""
    fn = NORMALIZERS[field_type]
    if isinstance(v, (list, tuple, set, frozenset)):
        if not multi_valued:
            raise CardinalityError(
                "collection value for single-valued field", {"value": v}
            )
        return [fn(x) for x in v]
    if multi_valued:
        return [fn(v)]
    return fn(v)
