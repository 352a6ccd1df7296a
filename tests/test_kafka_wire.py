"""Byte-level Kafka wire contract: a RECORDED v2 RecordBatch fixture —
byte-identical to a producer-written log segment, digest-pinned — replayed
through ``read_kafka_segment`` must produce the exact typed frame the live
``format("kafka")`` source + ``decode_kafka_events`` would, closing the
"no broker in the container" gap with the strongest broker-free evidence:
the bytes themselves (consumer.py:18-25 / producer.py:27-41 parity).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json

from mini_project_big_data_analysis_spark.sources.kafka_wire import (
    WireRecord,
    crc32c,
    encode_record_batch,
    parse_record_batches,
)

# The recorded fixture: three producer messages (the reference's JSON value
# serializer shape) in one batch at base offset 7, plus a second
# single-record batch — segments hold many batches back-to-back.
_EVENTS = [
    {"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.5,
     "props": '{"k":"a"}', "ts_ms": 1700000000000},
    {"event_id": 2, "user_id": 11, "event_type": "view", "value": None,
     "props": None, "ts_ms": 1700000000500},
    {"event_id": 3, "user_id": 10, "event_type": "click", "value": -2.25,
     "props": '{"k":"b"}', "ts_ms": 1700000001000},
]
_TAIL_EVENT = {"event_id": 4, "user_id": 12, "event_type": "purchase",
               "value": 9.99, "props": "{}", "ts_ms": 1700000002000}

# sha256 of the full segment blob: the fixture is RECORDED — any codec
# change that alters the bytes (and would therefore no longer match what a
# real producer writes) fails here before any semantic assertion runs.
_SEGMENT_SHA256 = "7d9754e0923a8f98fa245a2df6ca795292d69ed91e7ffe7497c24e20c2ef29d2"


def _segment_blob() -> bytes:
    first = encode_record_batch(
        [(str(e["user_id"]).encode(), json.dumps(e).encode()) for e in _EVENTS],
        base_offset=7,
        base_timestamp_ms=_EVENTS[0]["ts_ms"],
        timestamp_step_ms=500,
    )
    second = encode_record_batch(
        [(b"12", json.dumps(_TAIL_EVENT).encode())],
        base_offset=10,
        base_timestamp_ms=_TAIL_EVENT["ts_ms"],
    )
    return first + second


def test_crc32c_reference_vector():
    # the standard Castagnoli check value (RFC 3720 appendix / public vectors)
    assert crc32c(b"123456789") == 0xE3069283


def test_recorded_segment_is_stable_and_parses():
    blob = _segment_blob()
    assert hashlib.sha256(blob).hexdigest() == _SEGMENT_SHA256
    recs = list(parse_record_batches(blob))
    assert [r.offset for r in recs] == [7, 8, 9, 10]
    assert [r.timestamp_ms for r in recs] == [
        1700000000000, 1700000000500, 1700000001000, 1700000002000,
    ]
    assert recs[0] == WireRecord(
        offset=7, timestamp_ms=1700000000000, key=b"10",
        value=json.dumps(_EVENTS[0]).encode(),
    )
    # single corrupted byte anywhere in a batch → CRC failure, not bad data
    bad = bytearray(blob)
    bad[25] ^= 0x01
    try:
        list(parse_record_batches(bytes(bad)))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_segment_replay_matches_live_source_frame(spark, tmp_path):
    """End-to-end: segment file → binaryFile scan → mapInPandas parse →
    KAFKA_WIRE_SCHEMA frame → decode_kafka_events → the exact typed rows.
    README documents the one-line live swap (read_kafka_stream) — the
    decode and everything downstream are shared verbatim."""
    from mini_project_big_data_analysis_spark.sources.kafka_wire import (
        read_kafka_segment,
    )
    from mini_project_big_data_analysis_spark.streaming.pipeline import (
        KAFKA_WIRE_SCHEMA,
        decode_kafka_events,
    )

    seg = tmp_path / "00000000000000000007.log"  # broker segment naming
    seg.write_bytes(_segment_blob())

    wire = read_kafka_segment(spark, str(seg), topic="events", partition=0)
    declared = spark.createDataFrame([], KAFKA_WIRE_SCHEMA).schema
    assert [(f.name, f.dataType) for f in wire.schema.fields] == [
        (f.name, f.dataType) for f in declared.fields
    ]
    rows = {r["offset"]: r for r in wire.collect()}
    assert set(rows) == {7, 8, 9, 10}
    assert bytes(rows[7]["key"]) == b"10"
    assert json.loads(bytes(rows[9]["value"]))["event_id"] == 3
    assert rows[10]["timestamp"] == dt.datetime(2023, 11, 14, 22, 13, 22)

    decoded = {r.event_id: r for r in decode_kafka_events(wire).collect()}
    assert set(decoded) == {1, 2, 3, 4}
    assert decoded[1].event_type == "click" and decoded[1].value == 1.5
    assert decoded[2].value is None and decoded[2].props is None
    assert decoded[3].value == -2.25
    assert decoded[4].ts == dt.datetime(2023, 11, 14, 22, 13, 22)
    assert decoded[1].ts == dt.datetime(2023, 11, 14, 22, 13, 20)


def test_compressed_batch_is_refused_not_misparsed():
    """attributes bits 0-2 signal a compression codec; the parser must
    refuse (after CRC verification) rather than varint-decode compressed
    bytes into garbage records."""
    import struct

    from mini_project_big_data_analysis_spark.sources.kafka_wire import crc32c

    blob = bytearray(_segment_blob())
    # set codec=1 (gzip) in the first batch's attributes and re-sign the CRC
    attrs_off = 21
    (attrs,) = struct.unpack_from(">h", blob, attrs_off)
    struct.pack_into(">h", blob, attrs_off, attrs | 1)
    (batch_len,) = struct.unpack_from(">i", blob, 8)
    payload = bytes(blob[21 : 12 + batch_len])
    struct.pack_into(">I", blob, 17, crc32c(payload))
    try:
        list(parse_record_batches(bytes(blob)))
        raised = False
    except ValueError as e:
        raised = "compressed" in str(e)
    assert raised
