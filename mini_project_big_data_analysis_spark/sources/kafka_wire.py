"""Kafka wire/log-segment codec — the byte-level half of the broker swap.

The reference consumes a live broker (consumer.py:18-25: ``KafkaConsumer``
with a JSON value deserializer). ``streaming/pipeline.py`` already factors
that into config (``read_kafka_stream``) + a wire-schema decode
(``decode_kafka_events``); this module closes the remaining gap — the BYTES.
Kafka's on-disk log-segment format IS its wire format (the broker sends
stored RecordBatches verbatim, zero-copy), so a codec for the public v2
RecordBatch layout (Kafka protocol guide, KIP-98) lets tests replay a
*recorded* record batch through the exact schema the live
``spark.readStream.format("kafka")`` source would emit — no broker needed,
and nothing about the fixture is synthetic at the format level: the blob is
byte-for-byte what a producer-written segment contains.

``read_kafka_segment`` is the distributed read path: ``binaryFile`` scan of
segment files → per-file batch parse in Arrow-batched ``mapInPandas``.
Segment files are broker-bounded (1 GiB default, ``log.segment.bytes``), so
one file per task is the natural and memory-safe parallel unit at any
corpus size.

RecordBatch v2 layout (public Kafka protocol documentation):

    baseOffset:int64 batchLength:int32 partitionLeaderEpoch:int32
    magic:int8(=2) crc:uint32(CRC32C of attributes..end) attributes:int16
    lastOffsetDelta:int32 baseTimestamp:int64 maxTimestamp:int64
    producerId:int64 producerEpoch:int16 baseSequence:int32
    recordCount:int32 records:[Record]

    Record: length:varint attributes:int8 timestampDelta:varlong
            offsetDelta:varint keyLen:varint key valueLen:varint value
            headerCount:varint headers

with all per-record integers zigzag-varint encoded, and the CRC being
CRC32-C (Castagnoli) — not zlib's CRC32.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# CRC32-C (Castagnoli, polynomial 0x1EDC6F41 reflected = 0x82F63B78) —
# Kafka's batch checksum. Table-driven, pure python: fixture-scale only;
# the JVM kafka clients do this natively on a real cluster.
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# zigzag varints (protobuf-style, per the Kafka record encoding)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(n: int) -> bytes:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


# ---------------------------------------------------------------------------
# encode (the producer/broker role — used to RECORD fixtures)
# ---------------------------------------------------------------------------


def encode_record_batch(
    records: list[tuple[bytes | None, bytes]],
    base_offset: int = 0,
    base_timestamp_ms: int = 0,
    timestamp_step_ms: int = 1,
) -> bytes:
    """Encode ``[(key, value), …]`` as one spec-conformant v2 RecordBatch —
    byte-identical to what a (non-transactional, uncompressed) producer
    writes and a broker serves. Deterministic by construction so recorded
    fixtures can pin their digest."""
    body = bytearray()
    max_ts = base_timestamp_ms
    for i, (key, value) in enumerate(records):
        ts_delta = i * timestamp_step_ms
        max_ts = base_timestamp_ms + ts_delta
        rec = bytearray()
        rec += b"\x00"  # record attributes (unused by the spec today)
        rec += _write_varint(ts_delta)
        rec += _write_varint(i)  # offsetDelta
        if key is None:
            rec += _write_varint(-1)
        else:
            rec += _write_varint(len(key)) + key
        rec += _write_varint(len(value)) + value
        rec += _write_varint(0)  # headerCount
        body += _write_varint(len(rec)) + rec

    # attributes..end — the CRC32C input per the spec
    crc_payload = (
        struct.pack(">hiqqqhii", 0, len(records) - 1, base_timestamp_ms,
                    max_ts, -1, -1, -1, len(records))
        + bytes(body)
    )
    after_length = (
        struct.pack(">ib", -1, 2)  # partitionLeaderEpoch, magic=2
        + struct.pack(">I", crc32c(crc_payload))
        + crc_payload
    )
    return struct.pack(">qi", base_offset, len(after_length)) + after_length


@dataclass(frozen=True)
class WireRecord:
    offset: int
    timestamp_ms: int
    key: bytes | None
    value: bytes


def parse_record_batches(data: bytes) -> Iterator[WireRecord]:
    """Decode every RecordBatch in a segment blob, VERIFYING each batch's
    CRC32C (a corrupt batch raises — silent corruption is the one thing a
    storage-format reader may never pass through)."""
    pos = 0
    while pos < len(data):
        base_offset, batch_len = struct.unpack_from(">qi", data, pos)
        batch_end = pos + 12 + batch_len
        _, magic = struct.unpack_from(">ib", data, pos + 12)
        if magic != 2:
            raise ValueError(f"unsupported RecordBatch magic {magic}")
        (crc,) = struct.unpack_from(">I", data, pos + 17)
        payload = data[pos + 21 : batch_end]
        actual = crc32c(payload)
        if actual != crc:
            raise ValueError(
                f"RecordBatch CRC mismatch at offset {pos}: "
                f"stored {crc:#x}, computed {actual:#x}"
            )
        attrs, _lod, base_ts, _max_ts, _pid, _pep, _bseq, count = struct.unpack_from(
            ">hiqqqhii", payload, 0
        )
        if attrs & 0x07:
            # bits 0-2 = compression codec (gzip/snappy/lz4/zstd). Refusing
            # beats silently mis-parsing compressed record bytes as varints.
            raise ValueError(
                f"compressed RecordBatch (codec {attrs & 0x07}) unsupported"
            )
        p = 40  # past the fixed batch-header fields inside payload
        buf = payload
        for _ in range(count):
            rec_len, p = _read_varint(buf, p)
            rec_end = p + rec_len
            p += 1  # record attributes
            ts_delta, p = _read_varint(buf, p)
            off_delta, p = _read_varint(buf, p)
            klen, p = _read_varint(buf, p)
            key = None if klen < 0 else bytes(buf[p : p + klen])
            p += max(klen, 0)
            vlen, p = _read_varint(buf, p)
            value = bytes(buf[p : p + vlen])
            p = rec_end  # skip headers
            yield WireRecord(
                offset=base_offset + off_delta,
                timestamp_ms=base_ts + ts_delta,
                key=key,
                value=value,
            )
        pos = batch_end


def read_kafka_segment(
    spark: SparkSession, path: str, topic: str, partition: int = 0
) -> DataFrame:
    """Scan Kafka log-segment file(s) into the EXACT frame
    ``spark.read.format("kafka")`` would produce (KAFKA_WIRE_SCHEMA:
    key/value binary + topic/partition/offset/timestamp/timestampType) —
    ready for ``decode_kafka_events`` and the shared downstream graph.

    Distributed shape: ``binaryFile`` scan (one task per segment file;
    brokers cap segments at ``log.segment.bytes``, 1 GiB default, so the
    per-task unit is bounded) → Arrow-batched ``mapInPandas`` parse. Use
    for replaying recorded/archived segments; a live topic uses
    ``read_kafka_stream`` — both feed the identical decode."""
    import pandas as pd

    from ..streaming.pipeline import KAFKA_WIRE_SCHEMA

    raw = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for r in parse_record_batches(bytes(blob)):
                    rows.append(
                        (r.key, r.value, topic, partition, r.offset,
                         pd.Timestamp(r.timestamp_ms, unit="ms"), 0)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "value", "topic", "partition", "offset",
                    "timestamp", "timestampType",
                ],
            )

    return raw.select("content").mapInPandas(parse, KAFKA_WIRE_SCHEMA)
