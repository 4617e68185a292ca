"""Timestamp helpers that tolerate both TIMESTAMP and TIMESTAMP_NTZ.

Parquet written by other engines loads as TIMESTAMP_NTZ in Spark 4;
``unix_micros`` only accepts TIMESTAMP.  The session timezone is pinned
to UTC (session.py), so casting NTZ→TIMESTAMP is instant-preserving and
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
