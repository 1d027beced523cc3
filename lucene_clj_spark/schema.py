"""Field-spec schema — mirror of reference schema.clj.

A schema is ``{field_name: FieldSpec}``. The closed type enum is
{text keyword long boolean double instant} (schema.clj:13-14).
Per-field options and defaults (schema.clj:31-37, 72-91):
``indexed`` (True), ``stored`` (True), ``multi_valued`` (False),
``suggest`` = None | {"weight": pos-int (default 1),
"contexts_from": field-name | [field-name] | callable}.

Validation contracts (raise SchemaError, mirroring schema.clj:93-109):
- unknown type name;
- a field that is neither stored nor indexed nor suggest-enabled
  (schema.clj:85-90);
- ``suggest`` on a non-text/keyword field (schema.clj:80-84);
- legacy bucketed option names rejected (schema.clj:10-11, 96-101).

The schema travels WITH the index: the reference serializes field specs
into Lucene commit user-data (schema.clj:121-130) and reads them back on
open (schema.clj:132-140). We serialize to ``_field_specs.json`` inside
the index directory — same contract: typed exact queries keep working
after reopen (tested in tests/test_schema.py, mirroring
contract_test.clj:90-119).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import types as T

from lucene_clj_spark.errors import SchemaError

FIELD_TYPES = ("text", "keyword", "long", "boolean", "double", "instant")
_LEGACY_KEYS = {"stored-fields", "indexed-fields", "suggest-fields", "field-types"}

SPARK_TYPES = {
    "text": T.StringType(),
    "keyword": T.StringType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "instant": T.TimestampType(),
}


@dataclass(frozen=True)
class Suggest:
    weight: int = 1
    contexts_from: Any = None  # field name | list of names | callable


@dataclass(frozen=True)
class FieldSpec:
    type: str = "text"
    stored: bool = True
    indexed: bool = True
    multi_valued: bool = False
    suggest: Suggest | None = None
    analyzer: str | None = None  # per-field analyzer override (A4)

    def spark_type(self) -> T.DataType:
        base = SPARK_TYPES[self.type]
        return T.ArrayType(base) if self.multi_valued else base


def normalize_field_specs(raw: dict[str, Any]) -> dict[str, FieldSpec]:
    """Dict-or-FieldSpec input -> canonical {name: FieldSpec}; validates
    every contract listed in the module docstring."""
    if not isinstance(raw, dict) or not raw:
        raise SchemaError("fields must be a non-empty mapping", {"fields": raw})
    bad = _LEGACY_KEYS & set(raw)
    if bad:
        raise SchemaError(
            f"legacy bucketed options not supported: {sorted(bad)}", {"keys": bad}
        )
    out: dict[str, FieldSpec] = {}
    for name, spec in raw.items():
        if isinstance(spec, FieldSpec):
            fs = spec
        elif isinstance(spec, str):
            fs = FieldSpec(type=spec)
        elif isinstance(spec, dict):
            unknown = set(spec) - {
                "type", "stored", "indexed", "multi_valued", "suggest", "analyzer",
            }
            if unknown:
                raise SchemaError(
                    f"unknown field-spec keys for {name!r}: {sorted(unknown)}",
                    {"field": name, "keys": unknown},
                )
            sug = spec.get("suggest")
            if sug is not None and not isinstance(sug, Suggest):
                if not isinstance(sug, dict):
                    raise SchemaError(
                        f"suggest spec for {name!r} must be a mapping",
                        {"field": name},
                    )
                w = sug.get("weight", 1)
                if not isinstance(w, int) or isinstance(w, bool) or w < 1:
                    raise SchemaError(
                        f"suggest weight for {name!r} must be a positive int",
                        {"field": name, "weight": w},
                    )
                sug = Suggest(weight=w, contexts_from=sug.get("contexts_from"))
            fs = FieldSpec(
                type=spec.get("type", "text"),
                stored=spec.get("stored", True),
                indexed=spec.get("indexed", True),
                multi_valued=spec.get("multi_valued", False),
                suggest=sug,
                analyzer=spec.get("analyzer"),
            )
        else:
            raise SchemaError(
                f"field spec for {name!r} must be FieldSpec/dict/type-string",
                {"field": name},
            )
        if fs.type not in FIELD_TYPES:
            raise SchemaError(
                f"unknown field type {fs.type!r} for {name!r} "
                f"(allowed: {FIELD_TYPES})",
                {"field": name, "type": fs.type},
            )
        if fs.suggest is not None and fs.type not in ("text", "keyword"):
            raise SchemaError(
                f"suggest is only legal on text/keyword fields ({name!r} is "
                f"{fs.type})",
                {"field": name},
            )
        if not (fs.stored or fs.indexed or fs.suggest):
            raise SchemaError(
                f"field {name!r} must be stored, indexed, or suggest-enabled",
                {"field": name},
            )
        out[name] = fs
    return out


def specs_to_json(specs: dict[str, FieldSpec]) -> str:
    """Serialize (callable contexts_from degrade to a marker — same
    limitation as EDN-serializing a fn in the reference)."""
    payload = {}
    for name, fs in specs.items():
        d = asdict(fs)
        if fs.suggest and callable(fs.suggest.contexts_from):
            d["suggest"]["contexts_from"] = "<fn>"
        payload[name] = d
    return json.dumps(payload, indent=1, sort_keys=True)


def specs_from_json(s: str) -> dict[str, FieldSpec]:
    payload = json.loads(s)
    out = {}
    for name, d in payload.items():
        sug = d.get("suggest")
        out[name] = FieldSpec(
            type=d["type"],
            stored=d["stored"],
            indexed=d["indexed"],
            multi_valued=d["multi_valued"],
            suggest=Suggest(**sug) if sug else None,
            analyzer=d.get("analyzer"),
        )
    return out
