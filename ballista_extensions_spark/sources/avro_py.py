"""Pure-Python Avro Object Container File codec (Avro 1.11 spec).

The reference wire format declares AvroFormat
(proto/datafusion_common.proto:52 `message AvroOptions {}`) but never
exercises it; Spark's own avro datasource lives in the external
spark-avro module, which is absent from this deployment (and cannot be
fetched offline). This module implements the public Avro spec
<https://avro.apache.org/docs/1.11.1/specification/> directly so the
format is actually readable/writable here, not just gated:

- Object Container Files: magic ``Obj\\x01``, metadata map with
  ``avro.schema`` / ``avro.codec``, 16-byte sync marker, blocks of
  (count, byte-length, data, sync).
- Binary encoding: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed string/bytes, 1-byte boolean,
  union-index prefix, block-encoded arrays.
- Codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951).

Supported schema subset: records of primitives (boolean/int/long/float/
double/string/bytes), ``["null", T]`` unions, arrays of primitives, and
the timestamp-micros/date logical types (mapped to Spark Timestamp/
Date). Enums, maps, fixed, and nested records raise ``ValueError`` —
the honest boundary of a bridge format (the reference declares Avro as
transit-only, with empty options, too).

Scale design: both directions are executor-side. Writes go one
container file per partition (``mapPartitionsWithIndex``); reads
parallelize the file list and stream blocks per file. Row-at-a-time
Python encode/decode is the cost of having no JVM datasource — Avro
here is an ingest/egress bridge, not the hot path (convert to parquet
for repeated scans, as the docstring of read_arrow_ipc says for IPC).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- encode

def _zigzag_encode(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _spark_to_avro_type(dt: T.DataType, nullable: bool):
    if isinstance(dt, T.BooleanType):
        core = "boolean"
    elif isinstance(dt, T.IntegerType):
        core = "int"
    elif isinstance(dt, T.LongType):
        core = "long"
    elif isinstance(dt, T.FloatType):
        core = "float"
    elif isinstance(dt, T.DoubleType):
        core = "double"
    elif isinstance(dt, T.StringType):
        core = "string"
    elif isinstance(dt, T.BinaryType):
        core = "bytes"
    elif isinstance(dt, T.TimestampType):
        core = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.DateType):
        core = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, T.ArrayType):
        core = {
            "type": "array",
            "items": _spark_to_avro_type(dt.elementType, dt.containsNull),
        }
    else:
        raise ValueError(
            f"avro bridge: unsupported Spark type {dt.simpleString()} "
            "(records of primitives/arrays only)"
        )
    return ["null", core] if nullable else core


def schema_to_avro(schema: T.StructType) -> dict:
    return {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": f.name, "type": _spark_to_avro_type(f.dataType, f.nullable)}
            for f in schema.fields
        ],
    }


def _avro_to_spark_type(t) -> tuple[T.DataType, bool]:
    """Returns (spark type, nullable)."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or len(t) != len(non_null) + 1:
            raise ValueError(f"avro bridge: only ['null', T] unions, got {t}")
        inner, _ = _avro_to_spark_type(non_null[0])
        return inner, True
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-micros":
            return T.TimestampType(), False
        if lt == "date":
            return T.DateType(), False
        if t.get("type") == "array":
            elem, elem_null = _avro_to_spark_type(t["items"])
            return T.ArrayType(elem, elem_null), False
        return _avro_to_spark_type(t["type"])
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }.get(t)
    if prim is None:
        raise ValueError(f"avro bridge: unsupported avro type {t!r}")
    return prim, False


def avro_to_schema(avro_schema: dict) -> T.StructType:
    if avro_schema.get("type") != "record":
        raise ValueError("avro bridge: top-level schema must be a record")
    fields = []
    for f in avro_schema["fields"]:
        dt, nullable = _avro_to_spark_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


def _encode_core(t, v, out: bytearray) -> None:
    """Encode a non-null value of core (non-union) avro type t."""
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-micros":
            import datetime as _dt

            epoch = _dt.datetime(1970, 1, 1)
            # Exact integer micros: float total_seconds() has ~2.4e-7 s
            # resolution at 2026 epochs, so *1e6 + int() truncation
            # silently corrupts the last microsecond digit.
            micros = (
                (v - epoch) // _dt.timedelta(microseconds=1)
                if isinstance(v, _dt.datetime)
                else int(v)
            )
            out += _zigzag_encode(micros)
            return
        if lt == "date":
            import datetime as _dt

            days = (v - _dt.date(1970, 1, 1)).days if isinstance(v, _dt.date) else int(v)
            out += _zigzag_encode(days)
            return
        if t.get("type") == "array":
            items = t["items"]
            vals = list(v)
            if vals:
                out += _zigzag_encode(len(vals))
                for x in vals:
                    _encode_value(items, x, out)
            out += _zigzag_encode(0)
            return
        _encode_core(t["type"], v, out)
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "bytes":
        b = bytes(v)
        out += _zigzag_encode(len(b))
        out += b
    else:
        raise ValueError(f"avro bridge: cannot encode type {t!r}")


def _encode_value(t, v, out: bytearray) -> None:
    if isinstance(t, list):  # ["null", core]
        if v is None:
            out += _zigzag_encode(t.index("null"))
        else:
            core_idx = next(i for i, x in enumerate(t) if x != "null")
            out += _zigzag_encode(core_idx)
            _encode_core(t[core_idx], v, out)
    else:
        if v is None:
            raise ValueError("avro bridge: None in non-nullable field")
        _encode_core(t, v, out)


def _decode_core(t, buf: io.BytesIO):
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-micros":
            import datetime as _dt

            micros = _zigzag_decode(buf)
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=micros)
        if lt == "date":
            import datetime as _dt

            return _dt.date(1970, 1, 1) + _dt.timedelta(days=_zigzag_decode(buf))
        if t.get("type") == "array":
            items = t["items"]
            vals = []
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return vals
                if n < 0:  # block with byte-size prefix (spec-allowed)
                    n = -n
                    _zigzag_decode(buf)  # skip byte size
                for _ in range(n):
                    vals.append(_decode_value(items, buf))
        return _decode_core(t["type"], buf)
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(_zigzag_decode(buf))
    raise ValueError(f"avro bridge: cannot decode type {t!r}")


def _decode_value(t, buf: io.BytesIO):
    if isinstance(t, list):
        idx = _zigzag_decode(buf)
        if t[idx] == "null":
            return None
        return _decode_core(t[idx], buf)
    return _decode_core(t, buf)


# ------------------------------------------------------------ containers

def _write_meta_map(meta: dict[str, bytes]) -> bytes:
    out = bytearray()
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out += _zigzag_encode(len(kb))
        out += kb
        out += _zigzag_encode(len(v))
        out += v
    out += _zigzag_encode(0)
    return bytes(out)


def _read_meta_map(buf: io.BytesIO) -> dict[str, bytes]:
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            return meta
        if n < 0:
            n = -n
            _zigzag_decode(buf)  # byte size, unused
        for _ in range(n):
            k = buf.read(_zigzag_decode(buf)).decode("utf-8")
            meta[k] = buf.read(_zigzag_decode(buf))


def write_container(
    path: str,
    avro_schema: dict,
    rows,
    codec: str = "deflate",
    objects_per_block: int = 1000,
) -> int:
    """Write rows (dicts or Rows) to one Avro OCF. Returns row count."""
    if codec not in ("null", "deflate"):
        raise ValueError("avro bridge: codec must be null or deflate")
    import hashlib

    sync = hashlib.md5(path.encode() + b"|bx-avro").digest()  # deterministic
    fields = avro_schema["fields"]
    n_total = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(
            _write_meta_map(
                {
                    "avro.schema": json.dumps(avro_schema).encode("utf-8"),
                    "avro.codec": codec.encode("utf-8"),
                }
            )
        )
        f.write(sync)
        block = bytearray()
        n_block = 0

        def flush():
            nonlocal block, n_block, n_total
            if not n_block:
                return
            data = bytes(block)
            if codec == "deflate":
                co = zlib.compressobj(wbits=-15)  # raw RFC 1951 per spec
                data = co.compress(data) + co.flush()
            f.write(_zigzag_encode(n_block))
            f.write(_zigzag_encode(len(data)))
            f.write(data)
            f.write(sync)
            n_total += n_block
            block = bytearray()
            n_block = 0

        for row in rows:
            d = row.asDict() if isinstance(row, Row) else row
            for fld in fields:
                _encode_value(fld["type"], d.get(fld["name"]), block)
            n_block += 1
            if n_block >= objects_per_block:
                flush()
        flush()
    return n_total


def read_container(path: str):
    """Yield (avro_schema, row_dict) pairs — schema once per call via the
    first element being the schema dict (header read), then dict rows.

    Streams from the open file: a schema probe that stops after the
    first yielded element reads only the header bytes, and a full scan
    holds one compressed block (plus its decompressed copy) in memory
    at a time — never the whole file."""
    with open(path, "rb") as buf:
        if buf.read(4) != _MAGIC:
            raise ValueError(f"{path!r} is not an Avro object container file")
        meta = _read_meta_map(buf)
        avro_schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        if codec not in ("null", "deflate"):
            raise ValueError(f"avro bridge: unsupported codec {codec!r}")
        sync = buf.read(16)
        fields = avro_schema["fields"]
        yield avro_schema
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, os.SEEK_CUR)
            n_objs = _zigzag_decode(buf)
            n_bytes = _zigzag_decode(buf)
            data = buf.read(n_bytes)
            if codec == "deflate":
                data = zlib.decompress(data, wbits=-15)
            if buf.read(16) != sync:
                raise ValueError(
                    f"{path!r}: sync marker mismatch (corrupt block)"
                )
            bbuf = io.BytesIO(data)
            for _ in range(n_objs):
                yield {
                    fld["name"]: _decode_value(fld["type"], bbuf)
                    for fld in fields
                }


# --------------------------------------------------------- Spark bridge

def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> int:
    """Executor-side Avro write: one container file per partition under
    ``path``. Returns the number of part files."""
    os.makedirs(path, exist_ok=True)
    avro_schema = schema_to_avro(df.schema)

    def _part(pid: int, rows):
        out = os.path.join(path, f"part-{pid:05d}.avro")
        n = write_container(out, avro_schema, rows, codec=codec)
        if n == 0:
            os.remove(out)
            return
        yield out

    files = df.rdd.mapPartitionsWithIndex(_part).collect()
    # zero-row frames still need a schema-bearing file for read_avro
    if not files:
        write_container(
            os.path.join(path, "part-00000.avro"), avro_schema, [], codec=codec
        )
        files = ["part-00000.avro"]
    return len(files)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: schema from the first file's header
    (driver-side metadata read), data parsed on executors — one task per
    file."""
    import glob as _glob

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro files under {path!r}")
    else:
        files = [path]
    it = read_container(files[0])
    avro_schema = next(it)
    spark_schema = avro_to_schema(avro_schema)
    names = [f.name for f in spark_schema.fields]

    def _load(paths):
        for p in paths:
            gen = read_container(p)
            next(gen)  # schema
            for d in gen:
                yield tuple(d[n] for n in names)

    rdd = spark.sparkContext.parallelize(files, len(files)).mapPartitions(_load)
    return spark.createDataFrame(rdd, spark_schema)
