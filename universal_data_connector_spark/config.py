"""YAML pipeline configuration: reference-shaped, engine-validated.

The YAML shape is kept verbatim from the reference
(``config/PipelineConfig.java:6-47``, ``src/main/resources/
pipeline-config-example.yaml`` in ThatNinjaGuy/universal-data-connector):

.. code-block:: yaml

    pipelines:
      - name: "csv-to-parquet"
        source:        {type: file, properties: {path: ..., pattern: "*.csv"}}
        transformations:
          - {type: filter, properties: {column: status, condition: important}}
        sink:          {type: file, properties: {path: ..., format: parquet,
                                                 schema: '{"type":"record",...}'}}

so reference configs run unmodified. Additional ``type`` values (``sql``,
``project``, ``rename`` transformations; ``directory``/``kafka`` sources)
extend the same shape.

The reference's Avro record schema JSON (embedded as a string in the
parquet sink config, ``ParquetSinkContext.java:51-93``) is translated to
a Spark ``StructType`` here; supported Avro types are exactly the
reference's set: STRING, INT, LONG, FLOAT, DOUBLE, BOOLEAN plus nullable
unions (first non-null branch wins, ``ParquetSinkContext.java:388-396``).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from typing import Any

import yaml
from pyspark.sql import types as T

log = logging.getLogger(__name__)


@dataclass
class SourceConfig:
    type: str
    properties: dict[str, Any] = field(default_factory=dict)


@dataclass
class SinkConfig:
    type: str
    properties: dict[str, Any] = field(default_factory=dict)


@dataclass
class TransformationConfig:
    type: str
    properties: dict[str, Any] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    name: str
    source: SourceConfig
    sink: SinkConfig
    transformations: list[TransformationConfig] = field(default_factory=list)

    def validate(self) -> None:
        """Source and sink are required (``PipelineBuilder.java:164-174``)."""
        if not self.name:
            raise ValueError("pipeline name is required")
        if not self.source or not self.source.type:
            raise ValueError(f"pipeline {self.name!r}: source is required")
        if not self.sink or not self.sink.type:
            raise ValueError(f"pipeline {self.name!r}: sink is required")


@dataclass
class EngineConfig:
    pipelines: list[PipelineConfig] = field(default_factory=list)


def _norm_props(props: dict[str, Any] | None) -> dict[str, Any]:
    return dict(props or {})


def _typed_block(raw: dict[str, Any] | None, kind: str,
                 pipeline_name: Any) -> tuple[str, dict[str, Any]]:
    """``{type, properties}`` of a source/sink/transformation block.

    Keys sitting BESIDE ``type`` instead of under ``properties:`` are
    lifted into properties with a warning (nested ones win on
    collision). Without this, ``- {type: filter, condition: X}`` — a
    natural flattening of the reference shape — parsed as a filter
    with NO condition, which contains('') keeps everything: the
    pipeline ran and silently filtered nothing (caught live in the
    r20 verify pass, the same failure class as the r11 `transforms:`
    typo)."""
    raw = raw or {}
    props = _norm_props(raw.get("properties"))
    stray = {k: v for k, v in raw.items()
             if k not in ("type", "properties")}
    if stray:
        log.warning(
            "pipeline %r: %s key(s) %s found beside `type` — "
            "interpreting them as properties (nest them under "
            "`properties:` to silence this)",
            pipeline_name, kind, sorted(stray))
        for k, v in stray.items():
            props.setdefault(k, v)
    return str(raw.get("type") or ""), props


_PIPELINE_KEYS = {"name", "source", "sink", "transformations"}


def parse_config(raw: dict[str, Any]) -> EngineConfig:
    pipelines = []
    for p in raw.get("pipelines") or []:
        # Unknown keys are ignored (the reference's Spring binding does
        # the same) but WARNED, matching the engine's unknown-transform
        # warn+passthrough policy: a typo like `transforms:` for
        # `transformations:` silently disabled every transform (caught
        # live in the r11 verify pass — the config ran, unfiltered).
        unknown = set(p) - _PIPELINE_KEYS
        if unknown:
            log.warning(
                "pipeline %r: ignoring unrecognized key(s) %s — known "
                "keys are %s", p.get("name"), sorted(unknown),
                sorted(_PIPELINE_KEYS))
        name = p.get("name")
        src_type, src_props = _typed_block(p.get("source"), "source", name)
        snk_type, snk_props = _typed_block(p.get("sink"), "sink", name)
        cfg = PipelineConfig(
            name=str(name or ""),
            source=SourceConfig(type=src_type, properties=src_props),
            sink=SinkConfig(type=snk_type, properties=snk_props),
            transformations=[
                TransformationConfig(*_typed_block(t, "transformation", name))
                for t in (p.get("transformations") or [])
            ],
        )
        pipelines.append(cfg)
    return EngineConfig(pipelines=pipelines)


def load_config(path: str) -> EngineConfig:
    """YAML file -> EngineConfig (``config/ConfigurationLoader.java:17-31``)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return parse_config(raw)


# ---------------------------------------------------------------------------
# Avro record schema JSON -> Spark StructType
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def avro_schema_to_struct(schema_json: str) -> T.StructType:
    """Translate the reference's embedded Avro record schema to StructType.

    Mirrors the supported type set and the union rule (first non-null
    branch wins) of ``ParquetSinkContext.java:382-396``.
    """
    schema = json.loads(schema_json)
    if schema.get("type") != "record" or "fields" not in schema:
        raise ValueError("schema must be an Avro record with fields")
    fields = []
    for f in schema["fields"]:
        avro_type = f["type"]
        if isinstance(avro_type, list):  # union: first non-null branch wins
            avro_type = next((t for t in avro_type if t != "null"), "string")
        if not isinstance(avro_type, str) or avro_type not in _AVRO_TO_SPARK:
            raise ValueError(f"unsupported Avro type {avro_type!r} for field {f['name']!r}; "
                             f"supported: {sorted(_AVRO_TO_SPARK)}")
        # deliberately nullable=True regardless of the Avro union: the
        # lenient-cast pipeline flows NULLs (unparseable values) into
        # these fields before with_default closes the null channel, so
        # a non-nullable StructField would be a lie at that stage
        fields.append(T.StructField(f["name"], _AVRO_TO_SPARK[avro_type], nullable=True))
    return T.StructType(fields)
