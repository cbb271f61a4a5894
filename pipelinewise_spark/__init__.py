"""pipelinewise_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``marufmoinuddin/pipelinewise`` (Singer-spec tap/target ELT orchestration)
on Spark's execution model:

- change streams (binlog/WAL-shaped INSERT/UPDATE/DELETE events in
  singer RECORD/SCHEMA/STATE framing) are DataFrames / Structured
  Streaming sources;
- the warehouse upsert (reference: temp-table COPY + UPDATE/INSERT,
  ``target_postgres/db_sync.py:359-431``; Snowflake MERGE,
  ``target_snowflake/db_sync.py:442-546``) is an idempotent,
  bucket-pruned copy-on-write MERGE into a manifest-versioned parquet
  lake table (``pipelinewise_spark.lake``);
- bookmarks/STATE (reference: ``cli/pipelinewise.py:1034-1073``) commit
  atomically WITH the data in the same manifest version, giving
  exactly-once effective semantics under at-least-once replay;
- schema evolution (add column / version column on type change,
  reference ``target_postgres/db_sync.py:532-576``) is a logical→physical
  column mapping change in the manifest — no data rewrite;
- the transformation DSL (``transform-field`` connector) compiles to
  built-in Column expressions (no per-row Python).
"""

__version__ = "0.1.0"
