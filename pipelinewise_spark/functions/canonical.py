"""Value canonicalization expressions (SURVEY §1.2 / §2.2 T2, T11).

The reference normalizes every extracted value row-at-a-time in Python
(``tap-mysql .../binlog.py:200-265``, ``common.py:92-129``, ``tap-postgres
.../logical_replication.py:209-352``). Here each rule is a vectorized
Column expression; the whole canonicalization stage stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Out-of-range timestamp fallback (reference clamps unparseable/overflow
#: datetimes to a 9999-12-31 sentinel, ``logical_replication.py:24-25``,
#: ``target_snowflake/stream_utils.py:16-19``).
MAX_TIMESTAMP = "9999-12-31 23:59:59.999999"

ISO_PATTERN = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def iso_utc(ts: Column) -> Column:
    """ISO-8601 with explicit +00:00 offset (``binlog.py:208-219``: all
    datetimes are UTC-normalized then suffixed)."""
    return F.concat(F.date_format(ts, ISO_PATTERN), F.lit("+00:00"))


def date_to_iso(d: Column) -> Column:
    """DATE → midnight UTC ISO (``binlog.py:221-222``)."""
    return F.concat(F.date_format(d, "yyyy-MM-dd"), F.lit("T00:00:00+00:00"))


def clamp_timestamp(ts: Column, max_ts: str = MAX_TIMESTAMP) -> Column:
    mx = F.to_timestamp(F.lit(max_ts))
    return F.when(ts > mx, mx).otherwise(ts)


def parse_timestamp_safe(s: Column, max_ts: str = MAX_TIMESTAMP) -> Column:
    """Unparseable datetime strings → the MAX sentinel instead of error
    (``target_snowflake/stream_utils.py:38-71``)."""
    return F.coalesce(F.try_to_timestamp(s), F.to_timestamp(F.lit(max_ts)))


def bytes_to_hex(b: Column) -> Column:
    """binary → lower-hex string (``common.py:76-78``, ``binlog.py:243-245``)."""
    return F.lower(F.hex(b))


def bit_to_bool(c: Column) -> Column:
    """0/1/bit → boolean (``binlog.py:247-256``, ``common.py:112-119``)."""
    return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
        c.cast("long") != 0
    )


def json_canonical(c: Column) -> Column:
    """object/array column → JSON text (``binlog.py:232-233``)."""
    return F.to_json(c)


def mysql_lsn(log_file: Column, log_pos: Column) -> Column:
    """MySQL (binlog file index, pos) → one comparable int64, mirroring
    Postgres ``lsn_to_int`` (file<<32 + offset,
    ``logical_replication.py:46-76``). ``log_file`` is the numeric suffix
    of the binlog file name."""
    return F.shiftleft(log_file.cast("long"), 32) + log_pos.cast("long")


def lsn_to_parts(lsn: Column) -> tuple[Column, Column]:
    return F.shiftright(lsn, 32), lsn.bitwiseAND(F.lit((1 << 32) - 1))


def pg_lsn_to_int(lsn_str: Column) -> Column:
    """Textual pg_lsn 'XXXXXXXX/YYYYYYYY' → int64."""
    parts = F.split(lsn_str, "/")
    return F.shiftleft(F.conv(parts[0], 16, 10).cast("long"), 32) + F.conv(
        parts[1], 16, 10
    ).cast("long")


def epoch_to_iso(epoch: Column) -> Column:
    """Kafka-style epoch seconds → ISO (``tap_kafka/sync.py:96-109``)."""
    return iso_utc(F.timestamp_seconds(epoch))


def seconds_to_hms(sec: Column) -> Column:
    """MySQL TIME (as a seconds count) → 'HH:MM:SS' — the reference's
    ``format: time`` branch (``binlog.py:226-228``). Hours are NOT
    wrapped at 24 and NOT truncated (MySQL TIME ranges ±838:59:59, so up
    to 3 hour digits). Negative times render MySQL-style '-HH:MM:SS'
    (sign + absolute value) — a deliberate divergence from the
    reference's ``str(timedelta)``, which renders '-1 day, 22:58:59'."""
    s = F.abs(sec.cast("long"))
    hms = F.format_string(
        "%02d:%02d:%02d",
        (s / 3600).cast("long"),
        F.pmod((s / 60).cast("long"), F.lit(60)),
        F.pmod(s, F.lit(60)),
    )
    # format_string renders SQL NULL args as the literal 'null' — guard
    return (
        F.when(sec.isNull(), F.lit(None).cast("string"))
        .when(sec.cast("long") < 0, F.concat(F.lit("-"), hms))
        .otherwise(hms)
    )


def seconds_to_epoch_iso(sec: Column) -> Column:
    """MySQL TIME without a ``time`` format → epoch-anchored datetime ISO
    ('1970-01-01T{time}+00:00'), the reference's timedelta-from-epoch
    branch (``binlog.py:229-230``)."""
    return iso_utc(F.timestamp_seconds(sec.cast("long")))


def wkb_to_geojson(geom: Column) -> Column:
    """MySQL internal spatial value (4-byte little-endian SRID prefix +
    WKB) → GeoJSON string, the reference's ``format: spatial`` branch
    (``binlog.py:235-241``). Geometry decoding is inherently byte-level,
    so this is the engine's one sanctioned Python path: an Arrow-batched
    pandas UDF (the reference does the same work row-at-a-time)."""
    import json as _json
    import struct

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _coords(fmt, wkb, off, n):
        vals = struct.unpack_from(f"{fmt}{2 * n}d", wkb, off)
        return [list(vals[i: i + 2]) for i in range(0, 2 * n, 2)], off + 16 * n

    def _decode(b) -> str | None:
        # permissive null-out for NULL, truncated, or corrupt values —
        # the module's convention (strict rejection belongs to T12)
        if b is None or len(b) < 9:  # 4B SRID + 1B byte order + 4B type
            return None
        try:
            wkb = bytes(b)[4:]  # skip SRID
            fmt = "<" if wkb[0] == 1 else ">"
            (gtype,) = struct.unpack_from(f"{fmt}I", wkb, 1)
            if gtype == 1:  # Point
                x, y = struct.unpack_from(f"{fmt}dd", wkb, 5)
                return _json.dumps({"type": "Point", "coordinates": [x, y]})
            if gtype == 2:  # LineString
                (n,) = struct.unpack_from(f"{fmt}I", wkb, 5)
                pts, _ = _coords(fmt, wkb, 9, n)
                return _json.dumps({"type": "LineString", "coordinates": pts})
            if gtype == 3:  # Polygon
                (nrings,) = struct.unpack_from(f"{fmt}I", wkb, 5)
                off, rings = 9, []
                for _ in range(nrings):
                    (n,) = struct.unpack_from(f"{fmt}I", wkb, off)
                    pts, off = _coords(fmt, wkb, off + 4, n)
                    rings.append(pts)
                return _json.dumps({"type": "Polygon", "coordinates": rings})
        except struct.error:
            return None
        return None  # exotic geometry: caller falls back to hex (T2)

    def _apply(s: "pd.Series"):
        return s.map(_decode)

    _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_apply, "string")(geom)
