"""User-extensible structured-output schema surface (reference §2.10).

The reference accepts arbitrary pydantic models for every extraction /
distillation step (itext2kg/llm_output_parsing/llm_output_parser_interface.py:54-73,
documents_distiller.py:176; built-in schemas at
itext2kg/atom/models/schemas.py:1-204 and itext2kg_star/models/schemas.py).
Here the same surface is a thin adapter:

- a schema is EITHER a pydantic ``BaseModel`` subclass (pydantic ships with
  Ray) OR a plain dict spec ``{field: type}`` where type is one of
  ``str | int | float | list | dict`` or a nested dict spec;
- :func:`validate_output` coerces one raw client payload into a plain dict,
  raising :class:`~kgray.functions.retry.MalformedOutputError` on mismatch —
  which the retry machinery treats as a flat-backoff re-request, exactly the
  reference's malformed-structured-output path;
- :func:`schema_arrow_fields` maps a flat spec to Arrow columns so distilled
  objects with user schemas land in typed Parquet.

Built-in models mirror (paraphrased, not copied) the reference's
``Entity`` / ``Relationship`` / ``RelationshipsExtractor``
(atom/models/schemas.py:107-204): entities carry (name, label); a
relationship is (startNode, name-in-present-tense, endNode, t_start[],
t_end[]) with relative dates resolved against the observation date.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from kgray.functions.retry import MalformedOutputError

try:
    from pydantic import BaseModel, Field

    HAVE_PYDANTIC = True
except ImportError:  # pragma: no cover - pydantic ships with ray
    BaseModel = object  # type: ignore[assignment]
    HAVE_PYDANTIC = False


if HAVE_PYDANTIC:

    class EntityModel(BaseModel):
        """One concept: (name, label) — schemas.py:107-129."""

        name: str
        label: str = Field(default="")

    class RelationshipModel(BaseModel):
        """Present-tense predicate between two extracted entities with
        temporal bounds — schemas.py:139-195."""

        startNode: EntityModel
        endNode: EntityModel
        name: str
        t_start: list[str] = Field(default_factory=list)
        t_end: list[str] = Field(default_factory=list)

    class RelationshipsExtractorModel(BaseModel):
        """Top-level structured output for quintuple extraction —
        schemas.py:197-204 (``relationships`` is required there too, so a
        payload missing it is malformed and triggers a re-request)."""

        relationships: list[RelationshipModel]

    class AtomicFactsModel(BaseModel):
        """Factoid decomposition output — schemas.py:7-45 (`Factoid`)."""

        atomic_facts: list[str] = Field(default_factory=list)

else:  # pragma: no cover
    EntityModel = RelationshipModel = RelationshipsExtractorModel = AtomicFactsModel = None


_SCALARS = {str: pa.large_string(), int: pa.int64(), float: pa.float64()}


def is_pydantic_schema(schema: Any) -> bool:
    return HAVE_PYDANTIC and isinstance(schema, type) and issubclass(schema, BaseModel)


def validate_output(payload: Any, schema: Any) -> dict:
    """Coerce one raw client payload (dict / model instance / JSON-shaped
    object) into a plain dict matching ``schema``.

    Raises :class:`MalformedOutputError` on any mismatch, so callers can
    route the failure through the flat-backoff retry path."""
    try:
        if is_pydantic_schema(schema):
            if isinstance(payload, schema):
                return payload.model_dump()
            return schema.model_validate(payload).model_dump()
        if not isinstance(schema, dict):
            raise TypeError(f"schema must be a pydantic model or dict spec, got {schema!r}")
        if not isinstance(payload, dict):
            raise ValueError(f"expected object, got {type(payload).__name__}")
        out = {}
        for name, typ in schema.items():
            if name not in payload:
                raise ValueError(f"missing field {name!r}")
            val = payload[name]
            if isinstance(typ, dict):
                out[name] = validate_output(val, typ)
            elif typ is list:
                if not isinstance(val, list):
                    raise ValueError(f"field {name!r}: expected list")
                out[name] = val
            elif not isinstance(val, typ):
                raise ValueError(
                    f"field {name!r}: expected {typ.__name__}, got {type(val).__name__}"
                )
            else:
                out[name] = val
        return out
    except MalformedOutputError:
        raise
    except Exception as exc:
        raise MalformedOutputError(str(exc)) from exc


def flat_spec(schema: Any) -> dict:
    """Flatten a schema to ``{field: str|int|float|list}`` for column
    building: pydantic models via their field annotations (nested models
    degrade to str), dict specs pass through."""
    if is_pydantic_schema(schema):
        from typing import get_origin

        spec: dict = {}
        for name, field in schema.model_fields.items():
            ann = field.annotation
            if ann in (str, int, float):
                spec[name] = ann
            elif ann is list or get_origin(ann) is list:
                spec[name] = list
            else:
                spec[name] = str
        return spec
    return dict(schema)


def schema_arrow_fields(spec: dict) -> list[pa.Field]:
    """Flat dict spec → Arrow fields (list values become list<large_string>),
    so user-schema distilled objects write to typed Parquet columns."""
    fields = []
    for name, typ in spec.items():
        if typ is list:
            fields.append(pa.field(name, pa.list_(pa.large_string())))
        elif typ in _SCALARS:
            fields.append(pa.field(name, _SCALARS[typ]))
        else:
            fields.append(pa.field(name, pa.large_string()))
    return fields
