#!/usr/bin/env python
"""pipelinewise-spark — the unified CLI, one verb per reference command.

The reference ships a single ``pipelinewise <command>`` binary
(``cli/__init__.py:31-44``, COMMANDS). This CLI carries the same verb
set, mapped onto this engine:

=====================  =======================================================
verb                   behavior
=====================  =======================================================
init                   scaffold a project dir from the bundled samples
validate               JSON-schema + cross-ref validation of tap_*/target_* YAMLs
import                 validate, then render normalized per-tap JSON configs
encrypt_string         ansible-vault encrypt a secret, print the !vault block
discover_tap           emit a Singer catalog from a parquet/CSV dir, lake
                       table, or JDBC source
test_tap_connection    render every reader spec + TCP-probe the endpoints
status                 delegate → jobs/status.py (manifest-only health)
reset_state            rewind a stream's bookmark (+ clear replay guards)
partial_sync_table     ranged re-export → merge + vanish-delete (J6)
run_tap                delegate → jobs/run_cdc.py (args forwarded verbatim)
sync_tables            selective full resync of named streams, then tail
stop_tap               SIGTERM the pid in a run_tap --pidfile, wait for exit
compact                fold MoR deltas / rewrite long bucket chains (engine
                       extension — the lake's background optimize job)
vacuum                 GC unreferenced files + superseded manifests; with
                       --indexes, stale ANN codes snapshots (engine ext.)
=====================  =======================================================

Spark-free verbs (init/validate/import/encrypt_string/status/
reset_state/stop_tap) run instantly with no JVM; the rest create a
local session unless run under spark-submit.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SAMPLES_DIR = os.path.join(
    REPO_ROOT, "pipelinewise_spark", "samples"
)


def _get_spark(app: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    return spark


# ------------------------------------------------------------------ verbs


def cmd_init(args) -> int:
    project_dir = os.path.join(os.getcwd(), args.name)
    if os.path.exists(project_dir):
        print(f"directory exists, not overwriting: {project_dir}", file=sys.stderr)
        return 1
    os.mkdir(project_dir)
    for f in sorted(os.listdir(SAMPLES_DIR)):
        shutil.copyfile(
            os.path.join(SAMPLES_DIR, f), os.path.join(project_dir, f)
        )
    print(f"created {project_dir} with {len(os.listdir(project_dir))} sample files")
    return 0


def cmd_validate(args) -> int:
    from pipelinewise_spark.project_schema import (
        ProjectValidationError,
        validate_project_dir,
    )

    try:
        res = validate_project_dir(args.dir, args.secret)
    except ProjectValidationError as e:
        for f, msg in e.errors:
            print(f"INVALID {f}: {msg}", file=sys.stderr)
        return 1
    for tid, cfg in res["targets"].items():
        print(f"ok target {tid} ({cfg['type']}) -> {cfg['path']}")
    for tid, cfg in res["taps"].items():
        n = sum(len(s.get("tables") or []) for s in cfg["schemas"])
        print(f"ok tap    {tid} ({cfg['type']}), {n} table(s)")
    return 0


def cmd_import(args) -> int:
    """Validate + render each tap into the normalized JSON the runtime
    consumes — stream ids, reader specs, compiled-shape transform
    configs — under ``<out>/<target_id>/<tap_id>/config.json`` (the
    reference's ``~/.pipelinewise/<target>/<tap>/`` layout,
    ``cli/config.py`` ``Config.save``). Secrets decrypt on the way in,
    so the rendered configs are runnable; protect the output dir."""
    from pipelinewise_spark.config import reader_spec, stream_ids
    from pipelinewise_spark.project_schema import (
        ProjectValidationError,
        validate_project_dir,
    )

    try:
        res = validate_project_dir(args.dir, args.secret)
    except ProjectValidationError as e:
        for f, msg in e.errors:
            print(f"INVALID {f}: {msg}", file=sys.stderr)
        return 1
    selected = (
        {t.strip() for t in args.taps.split(",") if t.strip()}
        if args.taps
        else None
    )
    unknown = (selected or set()) - set(res["taps"])
    if unknown:
        print(f"unknown tap id(s): {sorted(unknown)}", file=sys.stderr)
        return 1
    written = []
    for tid, cfg in res["taps"].items():
        if selected is not None and tid not in selected:
            continue
        tgt = cfg.get("target", "default")
        streams = {}
        for schema in cfg["schemas"]:
            for table in schema.get("tables") or []:
                sid = f"{schema['source_schema']}-{table['table_name']}"
                try:
                    spec = reader_spec(cfg, schema["source_schema"], table)
                except ValueError as e:
                    # schema validation blocks the known cases; anything
                    # left reports as a clean error, not a traceback
                    print(f"INVALID {tid}/{sid}: {e}", file=sys.stderr)
                    return 1
                streams[sid] = {
                    "reader": spec,
                    "target_schema": schema.get(
                        "target_schema", schema["source_schema"]
                    ),
                    "key_properties": table.get("key_properties"),
                    "transformations": table.get("transformations") or [],
                }
        d = os.path.join(args.out, tgt, tid)
        os.makedirs(d, exist_ok=True)
        doc = {
            "id": tid,
            "type": cfg["type"],
            "target": tgt,
            "db_conn": cfg.get("db_conn", {}),
            "batch_size_rows": int(cfg.get("batch_size_rows", 20000)),
            "stream_ids": stream_ids(cfg),
            "streams": streams,
        }
        path = os.path.join(d, "config.json")
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1)
        written.append(path)
        print(f"imported {tid} -> {path}")
    if not written:
        print("no taps imported", file=sys.stderr)
        return 1
    return 0


def cmd_encrypt_string(args) -> int:
    from pipelinewise_spark import vault

    password = vault.load_secret_file(args.secret)
    ct = vault.encrypt(args.string, password)
    print(vault.format_ciphertext_yaml(ct, name=args.name))
    print("Encryption successful", file=sys.stderr)
    return 0


def cmd_status(args) -> int:
    from jobs.status import main as status_main

    argv = ["--root", args.root] + (["--json"] if args.json else [])
    return status_main(argv)


def cmd_reset_state(args) -> int:
    from pipelinewise_spark.lake.table import LakeTable

    if not LakeTable.exists(args.table):
        print(f"not a LakeTable: {args.table}", file=sys.stderr)
        return 1
    table = LakeTable(None, args.table)  # metadata-only, no Spark
    if args.stream not in table.bookmarks and not args.create:
        print(
            f"stream {args.stream!r} has no bookmark on this table "
            f"(streams: {sorted(table.bookmarks)}); pass --create to "
            f"seed one anyway",
            file=sys.stderr,
        )
        return 1
    before = table.bookmarks.get(args.stream)
    m = table.reset_state(
        bookmarks={args.stream: {"lsn": args.lsn}},
        clear_pipelines="*" if args.clear_all_pipelines
        else (args.clear_pipeline or []),
    )
    print(
        json.dumps(
            {
                "table": args.table,
                "stream": args.stream,
                "bookmark_before": before,
                "bookmark_after": m["bookmarks"][args.stream],
                "cleared_pipelines": m["summary"]["cleared_pipelines"],
                "version": m["version"],
            },
            default=str,
        )
    )
    return 0


def cmd_discover_tap(args) -> int:
    from pipelinewise_spark.singer import catalog as cat

    spark = _get_spark("pipelinewise-spark-discover")
    keys = [k.strip() for k in (args.key_properties or "").split(",") if k.strip()]
    if args.lake_table:
        from pipelinewise_spark.lake.table import LakeTable

        entry = cat.discover_lake_table(
            LakeTable(spark, args.lake_table),
            args.stream or os.path.basename(args.lake_table.rstrip("/")),
        )
    elif args.jdbc_url:
        if not args.source_table:
            print("--source-table required with --jdbc-url", file=sys.stderr)
            return 1
        entry = cat.discover_jdbc(
            spark, args.jdbc_url, args.source_table, keys
        )
    elif args.input:
        df = (
            spark.read.options(header=True, inferSchema=True).csv(args.input)
            if args.format == "csv"
            else spark.read.parquet(args.input)
        )
        entry = cat.discover_dataframe(
            df,
            args.stream or os.path.basename(args.input.rstrip("/")).split(".")[0],
            keys,
        )
    elif args.rest_url:
        # one bounded page, schema inferred from the live records — the
        # REST-family analog of the reference taps' discover mode
        from pipelinewise_spark.sources import rest

        auth = ("bearer", args.rest_token) if args.rest_token else None
        df, _ = rest.rest_reader(
            spark, args.rest_url, args.rest_path or "/",
            stream=args.stream or "rest",
            records_path=args.records_path or "",
            pagination="none", auth=auth,
        )
        entry = cat.discover_dataframe(
            df.drop("_sdc_extracted_at", "_sdc_source"),
            args.stream or (args.rest_path or "rest").strip("/").replace("/", "_"),
            keys,
        )
    else:
        print(
            "one of --input / --lake-table / --jdbc-url / --rest-url "
            "is required",
            file=sys.stderr,
        )
        return 1
    print(json.dumps(cat.catalog([entry]), indent=1))
    return 0


def _tcp_probe(host: str, port: int, timeout: float = 3.0) -> str | None:
    """None on success, else the failure reason."""
    import socket

    try:
        with socket.create_connection((host, int(port)), timeout=timeout):
            return None
    except (OSError, ValueError, TypeError) as e:
        # ValueError/TypeError: non-numeric port from the YAML — the
        # verb's contract is a clean per-stream FAIL row, not a traceback
        return str(e)


def cmd_test_tap_connection(args) -> int:
    """Reference semantics (``cli/pipelinewise.py:782-831``): prove the
    tap's source is reachable before running it. Here: render every
    table's reader spec (a spec that cannot render fails right here) and
    probe what is honestly probe-able without drivers — TCP connect for
    host:port sources, path existence for local file drops. Object-store
    URIs and bind-time-only sources report ``skip`` with the reason, not
    a fake pass."""
    from pipelinewise_spark.config import load_tap_yaml, reader_spec

    cfg = load_tap_yaml(args.project, args.secret)
    conn = cfg.get("db_conn", {}) or {}
    failures = 0
    rows = []
    for schema in cfg["schemas"]:
        for table in schema.get("tables") or []:
            sid = f"{schema['source_schema']}-{table['table_name']}"
            try:
                spec = reader_spec(cfg, schema["source_schema"], table)
            except ValueError as e:
                rows.append((sid, "FAIL", f"spec: {e}"))
                failures += 1
                continue
            mod = spec["module"]
            if mod == "jdbc":
                why = _tcp_probe(conn.get("host", ""), conn.get("port", 0),
                                 args.timeout)
                rows.append(
                    (sid, "FAIL" if why else "ok",
                     why or f"tcp {conn.get('host')}:{conn.get('port')}")
                )
                failures += bool(why)
            elif mod == "kafka":
                servers = (conn.get("bootstrap_servers") or "").split(",")
                why = None
                for s in servers:
                    s = s.strip()
                    if not s or ":" not in s:
                        why = f"bad bootstrap server {s!r}"
                        break
                    h, prt = s.rsplit(":", 1)
                    why = _tcp_probe(h, prt, args.timeout)
                    if why is None:
                        break  # one reachable broker is enough
                rows.append((sid, "FAIL" if why else "ok",
                             why or "bootstrap reachable"))
                failures += bool(why)
            elif mod == "rest":
                # the endpoint IS in the YAML (db_conn.base_url or the
                # tap family's default) — probe the API host, exactly
                # what the reference's tap connection test proves
                from urllib.parse import urlsplit

                u = urlsplit(spec["kwargs"]["base_url"])
                port = u.port or (443 if u.scheme == "https" else 80)
                why = (_tcp_probe(u.hostname, port, args.timeout)
                       if u.hostname else f"bad base_url {u.geturl()!r}")
                rows.append((sid, "FAIL" if why else "ok",
                             why or f"tcp {u.hostname}:{port}"))
                failures += bool(why)
            elif mod == "files":
                path = spec["kwargs"]["path"]
                if path.startswith(("s3a://", "s3://", "gs://", "abfss://")):
                    rows.append((sid, "skip",
                                 f"object-store path {path} needs "
                                 "credentials at run time"))
                elif os.path.isdir(path) or os.path.exists(path):
                    rows.append((sid, "ok", path))
                else:
                    rows.append((sid, "FAIL", f"no such path {path}"))
                    failures += 1
            else:  # mongo and other bind-time sources
                host, port = conn.get("host"), conn.get("port")
                if host and port:
                    why = _tcp_probe(host, port, args.timeout)
                    rows.append((sid, "FAIL" if why else "ok",
                                 why or f"tcp {host}:{port}"))
                    failures += bool(why)
                else:
                    rows.append((sid, "skip",
                                 "source binds at run time (no endpoint "
                                 "in YAML)"))
    w = max(len(r[0]) for r in rows) if rows else 10
    for sid, st, detail in rows:
        print(f"{sid:<{w}}  {st:<5}  {detail}")
    return 1 if failures else 0


def cmd_partial_sync_table(args) -> int:
    from pipelinewise_spark.cdc.partial import partial_sync
    from pipelinewise_spark.lake.table import LakeTable

    spark = _get_spark("pipelinewise-spark-partial-sync")
    if not LakeTable.exists(args.table):
        print(f"not a LakeTable: {args.table}", file=sys.stderr)
        return 1
    table = LakeTable(spark, args.table)
    start, end = _coerce(args.start_value), _coerce(args.end_value)
    if args.source_parquet:
        from pyspark.sql import functions as F

        export = spark.read.parquet(args.source_parquet).where(
            F.col(args.column).between(F.lit(start), F.lit(end))
        )
    elif args.jdbc_url:
        from pipelinewise_spark.sources.jdbc import range_reader

        export = range_reader(
            spark, args.jdbc_url, args.source_table or args.stream,
            column=args.column, start=start, end=end,
        ).load()
    else:
        print("one of --source-parquet / --jdbc-url is required", file=sys.stderr)
        return 1
    metrics = partial_sync(
        table, export,
        column=args.column, start=start, end=end,
        stream=args.stream,
        hard_delete=not args.no_hard_delete,
    )
    print(json.dumps({"table": args.table, "range": [args.start_value,
                      args.end_value], "metrics": metrics}, default=str))
    return 0


def _coerce(v: str):
    """CLI range bounds arrive as strings; numbers should compare as
    numbers (the reference renders them into SQL literals the same way,
    ``fastsync/commons/transform_utils.py``)."""
    if v is None:
        return None
    for t in (int, float):
        try:
            return t(v)
        except ValueError:
            pass
    return v


def cmd_sync_tables(args) -> int:
    """``pipelinewise sync_tables`` (reference
    ``cli/pipelinewise.py:1382-1428``): atomically re-snapshot ONLY the
    named streams of a project — bookmark reset to --lsn0 — leaving the
    other streams' incremental state untouched, then run the normal tail
    so the resynced streams catch up. Pure forwarding onto
    ``run_cdc --project --sync-tables`` (one code path, verb-shaped)."""
    from jobs.run_cdc import main as run_cdc_main

    argv = [
        "--project", args.project,
        "--table", args.table,
        "--events", args.events,
        "--checkpoint", args.checkpoint,
        "--sync-tables", args.tables,
        "--snapshot", args.snapshot,
        "--lsn0", str(args.lsn0),
    ]
    if args.secret:
        argv += ["--secret", args.secret]
    return run_cdc_main(argv)


def _pid_running(pid: int) -> bool:
    """Alive and not a zombie. A tap spawned by a wrapper script that
    has not reaped it yet stays signal-able as a zombie forever — that
    is 'stopped' for stop_tap's purposes."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    try:
        with open(f"/proc/{pid}/stat") as fh:
            state = fh.read().rsplit(")", 1)[1].split()[0]
        return state != "Z"
    except (OSError, IndexError):
        return True  # no /proc (non-Linux): signal-able == running


def cmd_stop_tap(args) -> int:
    try:
        with open(args.pidfile) as fh:
            pid = int(fh.read().strip())
        # 0 / negative would SIGTERM our own (or an arbitrary) process
        # GROUP — corrupt pidfile, never a tap
        if pid <= 0:
            raise ValueError(pid)
    except (FileNotFoundError, ValueError):
        print(f"no running tap ({args.pidfile} missing or empty)", file=sys.stderr)
        return 1
    try:
        os.kill(pid, signal.SIGTERM)
    except ProcessLookupError:
        print(f"pid {pid} not running (stale pidfile)", file=sys.stderr)
        try:
            os.unlink(args.pidfile)
        except FileNotFoundError:
            pass
        return 1
    deadline = time.monotonic() + args.timeout
    while time.monotonic() < deadline:
        if not _pid_running(pid):
            print(f"tap (pid {pid}) stopped")
            return 0
        time.sleep(0.2)
    print(
        f"tap (pid {pid}) still running after {args.timeout}s "
        "(graceful drain in progress — retry, or escalate manually)",
        file=sys.stderr,
    )
    return 1


def _target_tables(args) -> list[str] | None:
    """--table (one) or --root (walk) → table paths; None + stderr on
    a usage/shape error."""
    if bool(args.table) == bool(args.root):
        print("exactly one of --table / --root is required", file=sys.stderr)
        return None
    from pipelinewise_spark.lake.table import LakeTable

    if args.table:
        if not LakeTable.exists(args.table):
            print(f"not a LakeTable: {args.table}", file=sys.stderr)
            return None
        return [args.table]
    from jobs.status import find_tables

    tables = find_tables(args.root)
    if not tables:
        print(f"no LakeTables under {args.root}", file=sys.stderr)
    return tables


def cmd_compact(args) -> int:
    """Background optimize (no reference verb — warehouse targets
    compact themselves; a lake target must do it explicitly): fold
    merge-on-read deltas into the base and rewrite buckets whose file
    chains grew past --max-files-per-bucket. File-count-only compaction
    runs shuffle-free via the clustered bucket scan."""
    from pipelinewise_spark.lake.table import LakeTable

    tables = _target_tables(args)
    if tables is None:
        return 1
    spark = _get_spark("pipelinewise-spark-compact")
    out = []
    for path in tables:
        t = LakeTable(spark, path)
        m = t.compact(args.max_files_per_bucket)
        out.append({
            "table": path,
            "compacted": m is not None,
            **({"metrics": m.get("summary", m)} if isinstance(m, dict) else {}),
        })
    print(json.dumps(out, default=str))
    return 0


def cmd_vacuum(args) -> int:
    """Garbage-collect unreferenced data files, stale write temps, and
    superseded manifests (Spark-free — pure manifest/filesystem walk).
    --indexes also drops ANN indexes' superseded codes snapshots,
    including the reader-grace dir a re-save keeps; only use it when no
    query job older than the last re-save can still be running."""
    from pipelinewise_spark.lake.table import LakeTable

    if args.indexes and not args.root:
        # silently skipping would leave the operator believing the codes
        # snapshots were cleaned
        print("--indexes requires --root (indexes are discovered by "
              "walking the lake root)", file=sys.stderr)
        return 1
    tables = _target_tables(args)
    if tables is None:
        return 1
    out = []
    for path in tables:
        res = LakeTable(None, path).vacuum(
            keep_versions=args.keep_versions, min_age_sec=args.min_age_sec
        )
        out.append({"table": path, **res})
    indexes = []
    if args.indexes and args.root:
        from jobs.status import find_indexes
        from pipelinewise_spark.functions.ann_index import vacuum_index

        for ix in find_indexes(args.root):
            vacuum_index(ix)
            indexes.append(ix)
    print(json.dumps({"tables": out, "vacuumed_indexes": indexes},
                     default=str))
    return 0


# ------------------------------------------------------------------ parser


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pipelinewise-spark", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("init", help="scaffold a sample project directory")
    s.add_argument("--name", required=True)
    s.set_defaults(fn=cmd_init)

    s = sub.add_parser("validate", help="validate a project directory")
    s.add_argument("--dir", required=True)
    s.add_argument("--secret", help="vault password file")
    s.set_defaults(fn=cmd_validate)

    s = sub.add_parser(
        "import", aliases=["import_config"],
        help="validate + render normalized per-tap JSON configs",
    )
    s.add_argument("--dir", required=True)
    s.add_argument("--out", required=True, help="config root to write into")
    s.add_argument("--secret", help="vault password file")
    s.add_argument("--taps", help="comma-separated tap ids (default: all)")
    s.set_defaults(fn=cmd_import)

    s = sub.add_parser(
        "encrypt_string", help="vault-encrypt a secret for YAML embedding"
    )
    s.add_argument("--secret", required=True, help="vault password file")
    s.add_argument("--string", required=True, help="plaintext to encrypt")
    s.add_argument("--name", help="YAML variable name for the printed block")
    s.set_defaults(fn=cmd_encrypt_string)

    s = sub.add_parser("status", help="lake/table/index health from manifests")
    s.add_argument("--root", required=True)
    s.add_argument("--json", action="store_true")
    s.set_defaults(fn=cmd_status)

    s = sub.add_parser(
        "reset_state",
        help="rewind a stream bookmark so the next run replays from there",
    )
    s.add_argument("--table", required=True, help="LakeTable path")
    s.add_argument("--stream", required=True)
    s.add_argument("--lsn", required=True, type=int,
                   help="log position to rewind the bookmark to")
    s.add_argument("--clear-pipeline", action="append",
                   help="also clear this pipeline's applied-batch-id "
                        "replay guard (repeatable); required when the "
                        "rerun starts from a FRESH checkpoint")
    s.add_argument("--clear-all-pipelines", action="store_true",
                   help="clear EVERY pipeline's replay guard — the usual "
                        "choice: rewind-then-replay must not be no-op'd "
                        "by a stale guard under an internal pipeline id "
                        "the operator never chose")
    s.add_argument("--create", action="store_true",
                   help="allow seeding a bookmark for a stream this table "
                        "has never seen")
    s.set_defaults(fn=cmd_reset_state)

    s = sub.add_parser(
        "discover_tap", help="emit a Singer catalog for a source"
    )
    s.add_argument("--input", help="parquet/CSV directory")
    s.add_argument("--format", choices=["parquet", "csv"], default="parquet")
    s.add_argument("--lake-table", help="existing LakeTable path")
    s.add_argument("--jdbc-url")
    s.add_argument("--source-table", help="table name for --jdbc-url")
    s.add_argument("--rest-url", help="REST API base URL (SaaS tap family)")
    s.add_argument("--rest-path", help="endpoint path for --rest-url")
    s.add_argument("--rest-token", help="bearer token for --rest-url")
    s.add_argument("--records-path",
                   help="dotted path to the record list in the response")
    s.add_argument("--stream", help="stream name override")
    s.add_argument("--key-properties", help="comma-separated key columns")
    s.set_defaults(fn=cmd_discover_tap)

    s = sub.add_parser(
        "test_tap_connection",
        help="render reader specs + probe source endpoints",
    )
    s.add_argument("--project", required=True, help="tap YAML")
    s.add_argument("--secret", help="vault password file")
    s.add_argument("--timeout", type=float, default=3.0)
    s.set_defaults(fn=cmd_test_tap_connection)

    s = sub.add_parser(
        "partial_sync_table",
        help="ranged re-export -> merge + vanish-delete into a LakeTable",
    )
    s.add_argument("--table", required=True, help="target LakeTable path")
    s.add_argument("--stream", default="default")
    s.add_argument("--column", required=True)
    s.add_argument("--start_value", required=True)
    s.add_argument("--end_value", required=True)
    s.add_argument("--source-parquet", help="source export as parquet dir")
    s.add_argument("--jdbc-url", help="live source database")
    s.add_argument("--source-table", help="source table for --jdbc-url")
    s.add_argument("--no-hard-delete", action="store_true",
                   help="skip deleting target rows that vanished from "
                        "the exported range")
    s.set_defaults(fn=cmd_partial_sync_table)

    # run_tap forwards its whole tail to run_cdc.py verbatim — ALWAYS
    # handled in main() before argparse (argparse.REMAINDER no longer
    # consumes leading options reliably; `run_tap -h/--help` prints
    # run_cdc's real help). This entry exists only so the verb shows in
    # this parser's listing — it can never be parsed.
    sub.add_parser(
        "run_tap", add_help=False,
        help="run the CDC pipeline (forwards to jobs/run_cdc.py; "
             "`run_tap -h` for its options)",
    )

    s = sub.add_parser(
        "sync_tables",
        help="re-snapshot the named streams (bookmark -> --lsn0), "
             "leave the rest untouched, then tail",
    )
    s.add_argument("--project", required=True, help="tap YAML")
    s.add_argument("--tables", required=True,
                   help="comma-separated stream names to resync")
    s.add_argument("--table", required=True, help="lake ROOT path")
    s.add_argument("--events", required=True, help="change-event parquet dir")
    s.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    s.add_argument("--snapshot", required=True,
                   help="dir holding <stream>.parquet per selected stream")
    s.add_argument("--lsn0", required=True, type=int,
                   help="log position captured BEFORE the snapshot export")
    s.add_argument("--secret", help="vault password file")
    s.set_defaults(fn=cmd_sync_tables)

    s = sub.add_parser(
        "stop_tap", help="signal a --pidfile run_tap to stop, wait for exit"
    )
    s.add_argument("--pidfile", required=True)
    s.add_argument("--timeout", type=float, default=60.0)
    s.set_defaults(fn=cmd_stop_tap)

    s = sub.add_parser(
        "compact",
        help="fold MoR deltas + rewrite over-long bucket chains "
             "(the background optimize job)",
    )
    s.add_argument("--table", help="one LakeTable path")
    s.add_argument("--root", help="lake root: compact every table under it")
    s.add_argument("--max-files-per-bucket", type=int, default=1)
    s.set_defaults(fn=cmd_compact)

    s = sub.add_parser(
        "vacuum",
        help="GC unreferenced files / temps / superseded manifests "
             "(Spark-free)",
    )
    s.add_argument("--table", help="one LakeTable path")
    s.add_argument("--root", help="lake root: vacuum every table under it")
    s.add_argument("--keep-versions", type=int, default=1)
    s.add_argument("--min-age-sec", type=float, default=3600.0,
                   help="grace period protecting in-flight writers; 0 "
                        "only when no other writer can be active")
    s.add_argument("--indexes", action="store_true",
                   help="with --root: also drop ANN indexes' superseded "
                        "codes snapshots (breaks readers older than the "
                        "last re-save)")
    s.set_defaults(fn=cmd_vacuum)

    return p


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "run_tap":
        from jobs.run_cdc import main as run_cdc_main

        return run_cdc_main(list(argv[1:]))
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
