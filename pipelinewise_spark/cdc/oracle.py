"""Pure-Python reference fold — the correctness oracle (FIXTURES.md F5).

Folds a change-event list in strict LSN order into the expected final
table state: last write per (conv_id, turn_idx) wins; ``D`` removes the
row in hard-delete mode or retains it with ``_sdc_deleted_at`` set in soft
mode (reference: ``target_postgres/db_sync.py:493-497`` vs
``binlog.py:519-543``). Used only by tests — never by the engine.
"""

from __future__ import annotations


def fold_events(
    rows: list[dict],
    key_cols: list[str],
    *,
    soft_delete: bool = False,
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> dict[tuple, dict]:
    state: dict[tuple, dict] = {}
    for row in sorted(rows, key=lambda r: r[lsn_col]):
        key = tuple(row[k] for k in key_cols)
        op = row[op_col]
        if op == "D":
            if soft_delete:
                rec = {k: v for k, v in row.items() if k not in (op_col,)}
                rec["_deleted"] = True
                state[key] = rec
            else:
                state.pop(key, None)
        else:
            rec = {k: v for k, v in row.items() if k not in (op_col,)}
            rec["_deleted"] = False
            state[key] = rec
    return state
