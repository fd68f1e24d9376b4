"""Avro Object Container File source + sink, pure Python.

The reference ships ``flink-formats/flink-avro`` (AvroRowFormatFactory
— reads/writes Avro OCF rows for its table sources/sinks). Spark's
first-party equivalent is the ``spark-avro`` external package, which
is not available in this container — so this module implements the
format directly from the public Avro 1.11 spec (container file magic,
metadata map, zigzag-varint primitive encoding, deflate codec), with
the Spark side expressed the engine's usual way:

- sink: one OCF file per partition via ``foreachPartition`` (the same
  file-per-task layout every Spark file sink produces);
- source: the file list parallelized into a DataFrame and decoded by
  an Arrow-batched ``mapInPandas`` — each executor decodes its own
  files, so the scan distributes like any other file source.

Supported types (both directions): long/int, double/float, string,
boolean, binary, each nullable via the ``["null", T]`` union — the
primitive surface the reference's AvroRowDeserializationSchema maps
onto table rows — plus the Avro logical types the reference's
``AvroSchemaConverter`` handles: ``decimal`` (bytes + two's-complement
big-endian unscaled int, precision/scale from the Spark DecimalType),
``timestamp-micros`` (TimestampType), ``local-timestamp-micros``
(TimestampNTZType), and ``date`` (days since epoch).
"""

from __future__ import annotations

import calendar
import datetime as _dt
import io
import json
import os
import struct
import zlib
from decimal import Decimal

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker

_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {v: k for k, v in _SPARK_TO_AVRO.items()}


# ---------------------------------------------------------------------------
# Binary primitives (Avro spec §"Binary encoding")
# ---------------------------------------------------------------------------
def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_bytes(v: bytes) -> bytes:
    return _zigzag_encode(len(v)) + v


def _dec_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_zigzag_decode(buf))


_ENC = {
    "long": _zigzag_encode,
    "int": _zigzag_encode,
    "double": lambda v: struct.pack("<d", v),
    "float": lambda v: struct.pack("<f", v),
    "string": lambda v: _enc_bytes(v.encode("utf-8")),
    "bytes": lambda v: _enc_bytes(bytes(v)),
    "boolean": lambda v: b"\x01" if v else b"\x00",
}
_DEC = {
    "long": _zigzag_decode,
    "int": _zigzag_decode,
    "double": lambda b: struct.unpack("<d", b.read(8))[0],
    "float": lambda b: struct.unpack("<f", b.read(4))[0],
    "string": lambda b: _dec_bytes(b).decode("utf-8"),
    "bytes": _dec_bytes,
    "boolean": lambda b: b.read(1) == b"\x01",
}


# ---------------------------------------------------------------------------
# Logical types (Avro spec §"Logical Types")
# ---------------------------------------------------------------------------
def _branch(t):
    """Non-null branch of a (possibly union) Avro type."""
    if isinstance(t, list):
        t = [x for x in t if x != "null"][0]
    return t


def _type_key(t) -> str:
    """Canonical dispatch key: primitive name, or
    ``decimal:<precision>:<scale>`` / a logical-type name."""
    t = _branch(t)
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "decimal":
            return f"decimal:{t['precision']}:{t['scale']}"
        if lt in ("timestamp-micros", "local-timestamp-micros", "date"):
            return lt
        return t["type"]  # unknown logical type: fall back to base
    return t


def _micros(v: _dt.datetime) -> int:
    # naive wall-clock treated as UTC (session tz is pinned UTC in
    # session.py, so extraction and re-ingestion agree)
    return calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond


def _encoder(tkey: str):
    if tkey.startswith("decimal:"):
        _, _p, s = tkey.split(":")
        scale = int(s)

        def enc(v):
            unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            return _enc_bytes(unscaled.to_bytes(nbytes, "big", signed=True))

        return enc
    if tkey in ("timestamp-micros", "local-timestamp-micros"):
        return lambda v: _zigzag_encode(_micros(v))
    if tkey == "date":
        return lambda v: _zigzag_encode((v - _EPOCH_DATE).days)
    return _ENC[tkey]


def _decoder(tkey: str):
    if tkey.startswith("decimal:"):
        _, _p, s = tkey.split(":")
        scale = int(s)

        def dec(b):
            raw = _dec_bytes(b)
            return Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(-scale)

        return dec
    if tkey in ("timestamp-micros", "local-timestamp-micros"):
        return lambda b: _EPOCH_DT + _dt.timedelta(microseconds=_zigzag_decode(b))
    if tkey == "date":
        return lambda b: _EPOCH_DATE + _dt.timedelta(days=_zigzag_decode(b))
    return _DEC[tkey]


# ---------------------------------------------------------------------------
# Schema mapping
# ---------------------------------------------------------------------------
def _avro_field_type(dt):
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    t = dt.typeName()
    if t not in _SPARK_TO_AVRO:
        raise TypeError(
            f"avro source/sink supports {sorted(_SPARK_TO_AVRO)} plus "
            f"decimal/timestamp/timestamp_ntz/date, got {t!r} — cast first"
        )
    return _SPARK_TO_AVRO[t]


def _avro_schema(spark_schema) -> dict:
    fields = [
        {"name": f.name, "type": ["null", _avro_field_type(f.dataType)]}
        for f in spark_schema.fields
    ]
    return {"type": "record", "name": "row", "fields": fields}


def _ddl_type(tkey: str) -> str:
    if tkey.startswith("decimal:"):
        _, p, s = tkey.split(":")
        return f"decimal({p},{s})"
    return {
        "timestamp-micros": "timestamp",
        "local-timestamp-micros": "timestamp_ntz",
        "date": "date",
    }.get(tkey) or _AVRO_TO_SPARK[tkey]


def _spark_schema_ddl(avro: dict) -> str:
    return ", ".join(
        f"`{f['name']}` {_ddl_type(_type_key(f['type']))}"
        for f in avro["fields"]
    )


# ---------------------------------------------------------------------------
# File encode / decode
# ---------------------------------------------------------------------------
def _write_ocf(path: str, avro: dict, rows, codec: str = "deflate") -> None:
    encoders = [_encoder(_type_key(f["type"])) for f in avro["fields"]]
    body = bytearray()
    n = 0
    for row in rows:
        for v, enc in zip(row, encoders):
            if v is None:
                body += b"\x00"  # union branch 0 = null
            else:
                body += b"\x02" + enc(v)  # branch 1 = value
        n += 1
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    meta = {"avro.schema": json.dumps(avro), "avro.codec": codec}
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(_zigzag_encode(len(meta)))
        for k, v in meta.items():
            f.write(_enc_bytes(k.encode()) + _enc_bytes(v.encode()))
        f.write(b"\x00")  # end of metadata map
        f.write(SYNC)
        if n:
            f.write(_zigzag_encode(n))
            f.write(_zigzag_encode(len(payload)))
            f.write(payload)
            f.write(SYNC)


def _read_ocf(path: str) -> tuple[dict, list[tuple]]:
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = {}
    while True:
        cnt = _zigzag_decode(buf)
        if cnt == 0:
            break
        if cnt < 0:  # negative count: block byte-size follows
            _zigzag_decode(buf)
            cnt = -cnt
        for _ in range(cnt):
            k = _dec_bytes(buf).decode()
            meta[k] = _dec_bytes(buf)
    sync = buf.read(16)
    avro = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    decoders = [_decoder(_type_key(f["type"])) for f in avro["fields"]]
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bb = io.BytesIO(block)
        for _ in range(n):
            rows.append(
                tuple(
                    None if _zigzag_decode(bb) == 0 else dec(bb)
                    for dec in decoders
                )
            )
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return avro, rows


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------
def write_avro(df, path: str, codec: str = "deflate") -> None:
    """Write ``df`` as a directory of Avro OCF files, one per
    partition (the standard Spark file-sink layout)."""
    avro = _avro_schema(df.schema)
    os.makedirs(path, exist_ok=True)

    def _write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _write_ocf(
            os.path.join(path, f"part-{pid:05d}.avro"),
            avro,
            (tuple(r) for r in rows),
            codec,
        )

    df.foreachPartition(_write_partition)


def read_avro(spark, path: str):
    """Read a directory of Avro OCF files (or one file) as a
    DataFrame. The file list is parallelized and each executor decodes
    its own files inside an Arrow-batched ``mapInPandas``."""
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".avro")]
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    avro, _ = _read_ocf(files[0])  # schema from the first file
    ddl = _spark_schema_ddl(avro)
    names = [f["name"] for f in avro["fields"]]
    paths_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        min(len(files), 32)
    )

    types = [_type_key(f["type"]) for f in avro["fields"]]
    # nullable pandas dtypes: plain int64 can't hold None (it would
    # silently float-ify and fail Arrow's safe cast back to long).
    # Logical types stay object-dtype: Arrow converts Decimal /
    # datetime / date objects to the DDL-declared Spark types.
    pd_dtype = {"long": "Int64", "int": "Int32", "boolean": "boolean"}

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                _, rows = _read_ocf(p)
                cols = list(zip(*rows)) if rows else [[] for _ in names]
                yield pd.DataFrame(
                    {
                        n: pd.array(c, dtype=pd_dtype.get(t, "object"))
                        for n, t, c in zip(names, types, cols)
                    }
                )

    return paths_df.mapInPandas(_decode, schema=ddl)
