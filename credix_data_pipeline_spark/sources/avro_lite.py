"""Vendored minimal Avro Object Container File codec (r4 verdict ask #7).

The reference's change feed is Datastream Avro (rotated files,
terraform/modules/datastream/datastream_streams.tf:73-79).  This sandbox
ships neither the spark-avro jar nor a Python avro/fastavro module, so
the feed's ``file_format="avro"`` branch was gated to a loud refusal.
This module closes S4 by implementing the container format from the
public Avro 1.11 specification — nothing more than the feed needs:

* container framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  blocks of ``(count, byte-size, payload, sync)``;
* ``null``/``deflate`` codecs (deflate = raw zlib, RFC 1951);
* zigzag-varint longs; UTF-8 strings; nullable unions
  (``["null", X]``); arrays; ``long.timestamp-micros`` logicals —
  the closed set of shapes a flat change-event schema uses.

Spark integration keeps the engine's execution discipline:

* READ (the S4 engine surface) is fully distributed: ``binaryFile``
  scan → ``mapInPandas`` decode (one Arrow batch per file) → typed rows
  under the registry schema — the same plan shape as the multimodal
  decode operators.
* WRITE is a per-partition encode (``mapPartitions`` — the documented
  last resort, justified here because Spark cannot target a custom file
  format from the DataFrame writer), grouping rows by chunk inside each
  partition so output stays one file per (partition, chunk).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession, types as T

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic marker: fine, uniqueness is per-file


# --------------------------------------------------------------------------
# schema mapping (Spark StructType <-> Avro record schema)
# --------------------------------------------------------------------------
def _avro_type(dt: T.DataType) -> object:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType)):
        return "int"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        # Spark arrays carry containsNull — items are a nullable union
        return {"type": "array", "items": ["null", _avro_type(dt.elementType)]}
    raise ValueError(f"avro_lite: unsupported Spark type {dt.simpleString()}")


def to_avro_schema(schema: T.StructType, name: str = "change_event") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", _avro_type(f.dataType)]}
            for f in schema.fields
        ],
    }


def _spark_type(t) -> T.DataType:
    if isinstance(t, list):
        branches = [x for x in t if x != "null"]
        return _spark_type(branches[0])
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return T.TimestampType()
        if t["type"] == "array":
            return T.ArrayType(_spark_type(t["items"]))
        return _spark_type(t["type"])
    return {
        "string": T.StringType, "long": T.LongType, "int": T.IntegerType,
        "boolean": T.BooleanType, "double": T.DoubleType,
    }[t]()


def from_avro_schema(avro_schema: dict) -> T.StructType:
    """The writer schema back as a Spark StructType (nullable fields)."""
    return T.StructType([
        T.StructField(f["name"], _spark_type(f["type"]), True)
        for f in avro_schema["fields"]
    ])


# --------------------------------------------------------------------------
# primitive encode/decode
# --------------------------------------------------------------------------
def _zz_enc(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_dec(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _enc_value(out: bytearray, t, v) -> None:
    if isinstance(t, list):  # nullable union ["null", X]
        if v is None:
            out += _zz_enc(0)
            return
        out += _zz_enc(1)
        _enc_value(out, t[1], v)
        return
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            if hasattr(v, "timestamp"):
                from datetime import datetime as _dt, timezone

                # Spark collects timestamps as NAIVE datetimes in the
                # (UTC-pinned) session zone; datetime.timestamp() would
                # reinterpret them in the HOST zone.  Pin UTC explicitly
                # and subtract epochs in INTEGER microseconds — float
                # seconds round at modern epochs (~1.7e15 us).
                if v.tzinfo is None:
                    v = v.replace(tzinfo=timezone.utc)
                delta = v - _dt(1970, 1, 1, tzinfo=timezone.utc)
                us = (
                    delta.days * 86_400_000_000
                    + delta.seconds * 1_000_000
                    + delta.microseconds
                )
            else:
                us = int(v)
            out += _zz_enc(us)
            return
        if t["type"] == "array":
            items = list(v)
            if items:
                out += _zz_enc(len(items))
                for it in items:
                    _enc_value(out, t["items"], it)
            out += _zz_enc(0)
            return
        raise ValueError(f"avro_lite: cannot encode {t}")
    if t == "string":
        b = str(v).encode("utf-8")
        out += _zz_enc(len(b)) + b
    elif t in ("long", "int"):
        out += _zz_enc(int(v))
    elif t == "boolean":
        out.append(1 if v else 0)
    elif t == "double":
        out += struct.pack("<d", float(v))
    else:
        raise ValueError(f"avro_lite: cannot encode {t}")


def _dec_value(buf: memoryview, pos: int, t):
    if isinstance(t, list):
        branch, pos = _zz_dec(buf, pos)
        if t[branch] == "null":
            return None, pos
        return _dec_value(buf, pos, t[branch])
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            us, pos = _zz_dec(buf, pos)
            from datetime import datetime, timedelta

            # integer-exact inverse of the encoder (fromtimestamp on a
            # float-second value rounds microseconds at modern epochs);
            # naive UTC, matching Spark's collected representation
            return datetime(1970, 1, 1) + timedelta(microseconds=us), pos
        if t["type"] == "array":
            items = []
            while True:
                n, pos = _zz_dec(buf, pos)
                if n == 0:
                    break
                if n < 0:  # spec: negative count precedes a byte size
                    _, pos = _zz_dec(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _dec_value(buf, pos, t["items"])
                    items.append(v)
            return items, pos
        raise ValueError(f"avro_lite: cannot decode {t}")
    if t == "string":
        n, pos = _zz_dec(buf, pos)
        return str(buf[pos:pos + n], "utf-8"), pos + n
    if t in ("long", "int"):
        return _zz_dec(buf, pos)
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t == "double":
        return struct.unpack("<d", buf[pos:pos + 8])[0], pos + 8
    if t == "null":
        return None, pos
    raise ValueError(f"avro_lite: cannot decode {t}")


# --------------------------------------------------------------------------
# container file
# --------------------------------------------------------------------------
def encode_container(rows: list[dict], avro_schema: dict,
                     codec: str = "deflate") -> bytes:
    """One Avro OCF as bytes: header + a single block of ``rows``."""
    body = bytearray()
    for r in rows:
        for f in avro_schema["fields"]:
            _enc_value(body, f["type"], r.get(f["name"]))
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw RFC-1951, per spec
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_zz_enc(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zz_enc(len(kb)) + kb + _zz_enc(len(v)) + v)
    out.write(_zz_enc(0))
    out.write(_SYNC)
    if rows:
        out.write(_zz_enc(len(rows)) + _zz_enc(len(payload)))
        out.write(payload)
        out.write(_SYNC)
    return out.getvalue()


def decode_schema(data: bytes) -> dict:
    """Just the writer schema from OCF bytes (header-only read)."""
    buf = memoryview(data)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("avro_lite: not an Avro object container file")
    pos = 4
    while True:
        n, pos = _zz_dec(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _zz_dec(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = _zz_dec(buf, pos)
            k = str(buf[pos:pos + kl], "utf-8")
            pos += kl
            vl, pos = _zz_dec(buf, pos)
            if k == "avro.schema":
                return json.loads(bytes(buf[pos:pos + vl]))
            pos += vl
    raise ValueError("avro_lite: no avro.schema in file metadata")


def decode_container(data: bytes) -> tuple[dict, list[dict]]:
    """(writer schema, rows) from Avro OCF bytes (null/deflate codecs)."""
    buf = memoryview(data)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("avro_lite: not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zz_dec(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative block count: byte size follows
            _, pos = _zz_dec(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = _zz_dec(buf, pos)
            k = str(buf[pos:pos + kl], "utf-8")
            pos += kl
            vl, pos = _zz_dec(buf, pos)
            meta[k] = bytes(buf[pos:pos + vl])
            pos += vl
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    rows: list[dict] = []
    total = len(buf)
    while pos < total:
        count, pos = _zz_dec(buf, pos)
        size, pos = _zz_dec(buf, pos)
        block = bytes(buf[pos:pos + size])
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"avro_lite: unsupported codec {codec!r}")
        bview = memoryview(block)
        bpos = 0
        for _ in range(count):
            row = {}
            for f in schema["fields"]:
                row[f["name"]], bpos = _dec_value(bview, bpos, f["type"])
            rows.append(row)
        if bytes(buf[pos:pos + 16]) != sync:
            raise ValueError("avro_lite: sync marker mismatch (corrupt file)")
        pos += 16
    return schema, rows


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------
def write_avro_partitioned(df: DataFrame, out_root: str,
                           schema: T.StructType,
                           chunk_col: str | None = "chunk") -> None:
    """Distributed write of ``chunk=K/part-P.avro`` files (or, with
    ``chunk_col=None``, plain ``part-P.avro`` files under ``out_root``).

    ``mapPartitions`` (the documented last resort) because the DataFrame
    writer cannot target a custom format; each task groups its rows by
    chunk and emits one container file per (partition, chunk), mirroring
    ``partitionBy(chunk)`` layout.
    """
    avro_schema = to_avro_schema(schema)
    names = [f.name for f in schema.fields]

    def _write(pid: int, it):
        by_chunk: dict[int | None, list[dict]] = {}
        for row in it:
            d = row.asDict(recursive=False)
            ck = int(d.pop(chunk_col)) if chunk_col else None
            by_chunk.setdefault(ck, []).append(
                {n: d.get(n) for n in names}
            )
        for ck, rows in by_chunk.items():
            d = (
                os.path.join(out_root, f"{chunk_col}={ck}")
                if ck is not None
                else out_root
            )
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".part-{pid:05d}.avro.tmp")
            with open(tmp, "wb") as f:
                f.write(encode_container(rows, avro_schema))
            os.rename(tmp, os.path.join(d, f"part-{pid:05d}.avro"))
        return iter(())

    cols = ([chunk_col] if chunk_col else []) + names
    df.select(*cols).rdd.mapPartitionsWithIndex(
        _write, preservesPartitioning=True
    ).count()  # force execution


def read_avro_dirs(spark: SparkSession, paths: list[str],
                   schema: T.StructType) -> DataFrame:
    """Distributed OCF read: binaryFile scan → mapInPandas decode (one
    Arrow batch per file) → rows typed under the registry ``schema``
    (fields the writer lacked project as NULL — the same unionByName
    alignment contract as the parquet path)."""
    import pandas as pd

    names = [f.name for f in schema.fields]
    bf = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.avro"
    ).load(paths)

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = decode_container(bytes(content))
                yield pd.DataFrame(
                    {n: [r.get(n) for r in rows] for n in names}
                )

    return bf.select("content").mapInPandas(_decode, schema=schema)
