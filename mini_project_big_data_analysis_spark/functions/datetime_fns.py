"""Datetime scalar functions (SURVEY.md §2.2).

Semantics pinned to the reference's local-time handling: UTC base from epoch
seconds (consumer.py:59), explicit per-row offset added as an interval
(consumer.py:60), ``yyyy-MM-dd HH:mm:ss`` wire format (consumer.py:61).
Sessions must pin ``spark.sql.session.timeZone=UTC`` (session.py) — the
reference's ``utcfromtimestamp`` is TZ-naive, so UTC everywhere is the only
faithful mapping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WIRE_FORMAT = "yyyy-MM-dd HH:mm:ss"  # consumer.py:61 "%Y-%m-%d %H:%M:%S"


def epoch_to_ts(epoch_seconds: Column | str) -> Column:
    """Epoch seconds → UTC timestamp (consumer.py:59 utcfromtimestamp)."""
    return F.timestamp_seconds(F.col(epoch_seconds) if isinstance(epoch_seconds, str) else epoch_seconds)


def ts_add_offset_seconds(ts: Column | str, offset_seconds: Column | str) -> Column:
    """UTC timestamp + per-row offset seconds → local wall-clock timestamp
    (consumer.py:60 ``+ timedelta(seconds=offset)``).

    Interval arithmetic stays JVM-side: ``make_dt_interval`` with a column
    seconds argument compiles to a day-time interval add.
    """
    ts_c = F.col(ts) if isinstance(ts, str) else ts
    off_c = F.col(offset_seconds) if isinstance(offset_seconds, str) else offset_seconds
    return ts_c + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), off_c.cast("double"))


def ts_format(ts: Column | str, fmt: str = WIRE_FORMAT) -> Column:
    """Timestamp → wire string (consumer.py:61, app.py:156)."""
    return F.date_format(F.col(ts) if isinstance(ts, str) else ts, fmt)


def ts_parse(s: Column | str, fmt: str = WIRE_FORMAT) -> Column:
    """Wire string → timestamp (app.py:40 pd.to_datetime)."""
    return F.to_timestamp(F.col(s) if isinstance(s, str) else s, fmt)


def bround_like_pandas(c: Column | str, scale: int = 0) -> Column:
    """Round-half-even, matching pandas/NumPy ``.round()`` (app.py:44).

    Spark's ``round`` is HALF_UP; the reference's pandas coercion uses
    banker's rounding, so parity with the reference requires ``bround``
    (SURVEY.md §2.2 fn_cast_round note).
    """
    return F.bround(F.col(c) if isinstance(c, str) else c, scale)
