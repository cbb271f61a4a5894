"""Schema-drift state machine (reference: ``docs/user_guide/
schema_changes.rst``; ``target_postgres/db_sync.py:532-576``).

Rules, exactly as the reference applies them to the destination table:

- **new column** in the incoming schema → ADD COLUMN, historical rows
  read as NULL (``db_sync.py:539-549``);
- **type change** (including widenings — the reference compares mapped SQL
  types, so int32→int64 is a change) → "version" the column: the existing
  column is renamed ``{name}_{YYYYMMDD_HHMM}`` and a fresh column with the
  new type takes the original name; historical values are NOT converted
  (``db_sync.py:551-576``, ``schema_changes.rst:20-66``);
- **column disappears** from the source → kept forever, never dropped
  (``schema_changes.rst:14-18``).

On the LakeTable all three are metadata-only manifest commits (see
lake/table.py) — no data rewrite at any scale.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql.types import StructType

from pipelinewise_spark.lake.table import METADATA_COLS, LakeTable


def _tjson(dt) -> object:
    return json.loads(dt.json())


# Widening chains the parquet reader converts natively (verified on
# Spark 4.x: old INT32/FLOAT pages read directly into the wider
# requested type — SPARK-40876 widening type promotion): a promote is a
# pure metadata type change on the SAME physical column, mixed-era
# files need no rewrite and no version-column churn.
_WIDEN_CHAINS = (
    ["byte", "short", "integer", "long"],
    ["float", "double"],
)


def _widens_to(cur: object, new: object) -> bool:
    """True iff ``cur`` → ``new`` is a pure widening (both scalar type
    names on the same chain, new strictly wider)."""
    if not isinstance(cur, str) or not isinstance(new, str):
        return False
    for chain in _WIDEN_CHAINS:
        if cur in chain and new in chain:
            return chain.index(new) > chain.index(cur)
    return False


def diff_schemas(
    table: LakeTable,
    incoming: StructType,
    *,
    now: datetime | None = None,
    widen: str = "version",
) -> list[dict]:
    """Compute evolution actions to reconcile the table with an incoming
    stream schema (from a Singer SCHEMA message or a decoded batch).

    ``widen`` — what a PURE WIDENING type change (int→long,
    float→double) becomes: ``"version"`` (default, exact reference
    parity: the reference compares mapped SQL types and versions every
    change, ``db_sync.py:551-576``) or ``"promote"`` (native in-place
    promotion: metadata-only type update on the same physical column —
    no version-column churn, historical values remain queryable under
    the original name). Narrowings and cross-family changes always
    version."""
    if widen not in ("version", "promote"):
        raise ValueError(f"widen must be version|promote, got {widen!r}")
    now = now or datetime.now(timezone.utc)
    suffix = now.strftime("%Y%m%d_%H%M")
    current = {
        f["logical"]: f["type"]
        for f in table.manifest["fields"]
        if f["logical"] not in METADATA_COLS
    }
    actions: list[dict] = []
    for field in incoming.fields:
        name, tj = field.name, _tjson(field.dataType)
        if name not in current:
            actions.append({"action": "add_column", "name": name, "type": tj})
        elif current[name] != tj:
            if widen == "promote" and _widens_to(current[name], tj):
                actions.append(
                    {"action": "promote_column", "name": name, "type": tj}
                )
            else:
                actions.append(
                    {
                        "action": "version_column",
                        "name": name,
                        "type": tj,
                        "versioned_name": f"{name}_{suffix}",
                    }
                )
    return actions


def reconcile(
    table: LakeTable,
    incoming: StructType,
    *,
    now: datetime | None = None,
    allow_key_type_change: bool = False,
    widen: str = "version",
) -> list[dict]:
    """Diff + apply. Versioning a primary-key column would break the merge
    identity, so it is rejected unless explicitly allowed (the reference
    has the same hazard — it just corrupts silently). The same guard
    covers BUCKET columns (which may differ from key_cols): versioning one
    rebinds bucket_expr to the fresh NULL-backfilled physical column,
    silently re-assigning every existing row's bucket — later merges would
    probe/replace the wrong buckets and duplicate keys across buckets.
    PROMOTING a bucket column is just as unsafe even though values are
    preserved: Spark's murmur3 hashes int and long inputs differently, so
    the same logical key would route to a DIFFERENT bucket after the
    promote — hence the guard covers promote_column too."""
    actions = diff_schemas(table, incoming, now=now, widen=widen)
    protected = set(table.key_cols) | set(table.bucket_cols)
    for a in actions:
        if (
            a["action"] in ("version_column", "promote_column")
            and a["name"] in protected
            and not allow_key_type_change
        ):
            kind = "key" if a["name"] in table.key_cols else "bucket"
            raise ValueError(
                f"type change on {kind} column {a['name']!r} requires "
                "allow_key_type_change=True"
            )
    if actions:
        table.evolve(actions)
    return actions
