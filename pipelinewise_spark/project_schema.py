"""Project YAML validation — the ``pipelinewise validate`` contract.

The reference validates every ``tap_*.yml`` / ``target_*.yml`` in a
project directory against draft-07 JSON schemas
(``cli/schemas/tap.json`` / ``target.json``, runner
``cli/pipelinewise.py:1531-1617``) and then cross-checks: no duplicate
ids, every tap's ``target`` names a known target. These schemas are the
same idea re-scoped to THIS engine's surface: tap types are the ones
``pipelinewise_spark.config`` can wire, the one target type is the
bucketed lake, and the transformation enum is exactly what
``transform/compiler.py`` compiles (T3–T7) — a config that validates
here will not die later inside a stream.

Shape-only checks live in the schema; anything needing values joined
across entries (duplicate ids, dangling target refs, INCREMENTAL
without a key — which the schema also encodes via ``anyOf`` like the
reference's) is in :func:`validate_project_dir`.
"""

from __future__ import annotations

import os
from typing import Any

from pipelinewise_spark.config import (
    REPLICATION_METHODS,
    SUPPORTED_TAP_TYPES,
    load_yaml,
    stream_ids,
)

#: transformation ``type`` values the compiler accepts —
#: fixed names plus the two parameterized families
#: (``transform_field/transform.py:157-188``).
_TRANSFORM_TYPE = {
    "anyOf": [
        {
            "enum": [
                "SET-NULL",
                "HASH",
                "MASK-DATE",
                "MASK-NUMBER",
                "MASK-HIDDEN",
            ]
        },
        {"type": "string", "pattern": r"^HASH-SKIP-FIRST-\d+$"},
        {"type": "string", "pattern": r"^MASK-STRING-SKIP-ENDS-\d+$"},
    ]
}

_CONDITION = {
    "anyOf": [
        {
            "type": "object",
            "properties": {
                "column": {"type": "string", "minLength": 1},
                "field_path": {"type": "string", "minLength": 1},
                "equals": {
                    "type": ["null", "integer", "string", "boolean", "number"]
                },
            },
            "required": ["column", "equals"],
            "additionalProperties": False,
        },
        {
            "type": "object",
            "properties": {
                "column": {"type": "string", "minLength": 1},
                "field_path": {"type": "string", "minLength": 1},
                "regex_match": {"type": "string", "minLength": 1},
            },
            "required": ["column", "regex_match"],
            "additionalProperties": False,
        },
    ]
}

_TRANSFORMATION = {
    "type": "object",
    "properties": {
        "column": {"type": "string", "minLength": 1},
        "type": _TRANSFORM_TYPE,
        "when": {"type": "array", "items": _CONDITION, "minItems": 1},
    },
    "required": ["column", "type"],
}

#: a table entry: INCREMENTAL requires replication_key (same ``anyOf``
#: split as the reference's table definition).
_TABLE = {
    "type": "object",
    "properties": {
        "table_name": {"type": "string", "minLength": 1},
        "replication_method": {"enum": list(REPLICATION_METHODS)},
        "replication_key": {"type": "string", "minLength": 1},
        "key_properties": {
            "type": "array",
            "items": {"type": "string", "minLength": 1},
            "minItems": 1,
        },
        "transformations": {"type": "array", "items": _TRANSFORMATION},
        # REST tap family only (sources/rest.py): endpoint config
        "path": {"type": "string", "minLength": 1},
        "records_path": {"type": "string"},
        "pagination": {"enum": ["link", "cursor", "page", "none"]},
        "since_param": {"type": "string", "minLength": 1},
    },
    "required": ["table_name"],
    "anyOf": [
        {
            "properties": {
                "replication_method": {"enum": ["FULL_TABLE", "LOG_BASED"]}
            }
        },
        {
            "properties": {"replication_method": {"const": "INCREMENTAL"}},
            "required": ["replication_key"],
        },
        {"not": {"required": ["replication_method"]}},
    ],
}

TAP_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {
        "id": {"type": "string", "minLength": 1},
        "name": {"type": "string"},
        "type": {"enum": sorted(SUPPORTED_TAP_TYPES)},
        "owner": {"type": "string"},
        "target": {"type": "string", "minLength": 1},
        "db_conn": {"type": "object"},
        "batch_size_rows": {"type": "integer", "minimum": 1},
        # T12 — record validation (reference: per-tap validate_records
        # bool, raise on malformed). Engine extension: the string forms
        # select the mode directly; "quarantine" diverts bad records to
        # a dead-letter LakeTable instead of failing the pipeline.
        "validate_records": {
            "oneOf": [
                {"type": "boolean"},
                {"enum": ["permissive", "strict", "quarantine"]},
            ],
        },
        # failure alerting (reference: alert_handlers in config.yml,
        # send_alert/slack_alert_channel per tap — one YAML here)
        "send_alert": {"type": "boolean"},
        "slack_alert_channel": {"type": "string", "minLength": 1},
        "alert_handlers": {
            "type": "object",
            "properties": {
                "slack": {
                    "type": "object",
                    "required": ["token", "channel"],
                },
                "victorops": {
                    "type": "object",
                    "required": ["base_url", "routing_key"],
                },
                "webhook": {
                    "type": "object",
                    "required": ["url"],
                },
            },
            "additionalProperties": False,
        },
        "schemas": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "properties": {
                    "source_schema": {"type": "string", "minLength": 1},
                    "target_schema": {"type": "string", "minLength": 1},
                    "tables": {"type": "array", "items": _TABLE},
                },
                "required": ["source_schema"],
            },
        },
    },
    "required": ["id", "type", "schemas"],
}

TARGET_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {
        "id": {"type": "string", "minLength": 1},
        "name": {"type": "string"},
        "type": {"enum": ["target-lake"]},
        "path": {"type": "string", "minLength": 1},
        "num_buckets": {"type": "integer", "minimum": 1},
        "soft_delete": {"type": "boolean"},
        "max_concurrency": {"type": "integer", "minimum": 1},
    },
    "required": ["id", "type", "path"],
}


class ProjectValidationError(ValueError):
    """One or more project files failed validation; ``errors`` holds
    ``(file, message)`` pairs."""

    def __init__(self, errors: list[tuple[str, str]]):
        self.errors = errors
        super().__init__(
            "; ".join(f"{f}: {m}" for f, m in errors) or "invalid project"
        )


def validate_config(cfg: Any, schema: dict) -> list[str]:
    """JSON-schema check, every violation (not just the first), each as
    ``<json path>: <message>``."""
    import jsonschema

    v = jsonschema.Draft7Validator(schema)
    out = []
    for err in sorted(v.iter_errors(cfg), key=lambda e: list(e.absolute_path)):
        path = "$" + "".join(
            f"[{p}]" if isinstance(p, int) else f".{p}"
            for p in err.absolute_path
        )
        out.append(f"{path}: {err.message}")
    return out


def project_files(yaml_dir: str) -> tuple[list[str], list[str]]:
    """(tap files, target files) in ``yaml_dir`` — the reference's
    ``tap_*.yml`` / ``target_*.yml`` naming convention
    (``cli/utils.py:152-172``)."""
    names = sorted(
        f
        for f in os.listdir(yaml_dir)
        if os.path.isfile(os.path.join(yaml_dir, f))
        and (f.endswith(".yml") or f.endswith(".yaml"))
    )
    taps = [f for f in names if f.startswith("tap_")]
    targets = [f for f in names if f.startswith("target_")]
    return taps, targets


def validate_project_dir(
    yaml_dir: str, vault_secret: str | None = None
) -> dict:
    """Validate a whole project directory. Returns
    ``{"taps": {id: cfg}, "targets": {id: cfg}}`` on success; raises
    :class:`ProjectValidationError` listing EVERY problem (schema
    violations per file, duplicate ids, a tap whose ``target`` names no
    target file, duplicate stream ids within a tap)."""
    taps_f, targets_f = project_files(yaml_dir)
    errors: list[tuple[str, str]] = []
    targets: dict[str, dict] = {}
    taps: dict[str, dict] = {}
    for f in targets_f:
        try:
            cfg = load_yaml(os.path.join(yaml_dir, f), vault_secret)
        except Exception as e:  # unparseable/undecryptable file
            errors.append((f, str(e)))
            continue
        for m in validate_config(cfg, TARGET_SCHEMA):
            errors.append((f, m))
            cfg = None
        if cfg is None:
            continue
        if cfg["id"] in targets:
            errors.append((f, f"duplicate target id {cfg['id']!r}"))
        else:
            targets[cfg["id"]] = cfg
    for f in taps_f:
        try:
            cfg = load_yaml(os.path.join(yaml_dir, f), vault_secret)
        except Exception as e:
            errors.append((f, str(e)))
            continue
        for m in validate_config(cfg, TAP_SCHEMA):
            errors.append((f, m))
            cfg = None
        if cfg is None:
            continue
        if cfg["id"] in taps:
            errors.append((f, f"duplicate tap id {cfg['id']!r}"))
            continue
        taps[cfg["id"]] = cfg
        tgt = cfg.get("target")
        if targets_f and tgt and tgt not in targets:
            errors.append(
                (f, f"target {tgt!r} does not match any target_*.yml id")
            )
        sids = stream_ids(cfg)
        dupes = sorted({s for s in sids if sids.count(s) > 1})
        if dupes:
            errors.append((f, f"duplicate stream ids {dupes}"))
    if not taps_f and not targets_f:
        errors.append((yaml_dir, "no tap_*.yml or target_*.yml files found"))
    if errors:
        raise ProjectValidationError(errors)
    return {"taps": taps, "targets": targets}
