"""Text-tick ingest: typed parse, malformed quarantine, CSV round-trip."""

from __future__ import annotations

from timeseriescorrelation_spark.sources.textingest import (
    parse_tick_lines,
    read_ticks_csv,
)

LINES = [
    "sA,2025-01-01,00:00:10,1.5",
    "sA,2025-01-01,00:01:40,2.5",
    "sB,2025-01-01,00:00:05,-3.25",
    "garbage line without commas",
    "sC,2025-13-45,99:99:99,1.0",   # bad timestamp
    "sD,2025-01-01,00:00:01,notanumber",
]


def test_parse_tick_lines(spark):
    lines = spark.createDataFrame([(x,) for x in LINES], "value string")
    out = parse_tick_lines(lines).collect()
    good = [r for r in out if not r.malformed]
    bad = [r for r in out if r.malformed]
    assert len(good) == 3 and len(bad) == 3
    byid = {(r.series_id, r.value) for r in good}
    assert byid == {("sA", 1.5), ("sA", 2.5), ("sB", -3.25)}
    assert all(r.ts is not None for r in good)


def test_read_ticks_csv(spark, tmp_path):
    p = tmp_path / "ticks.csv"
    p.write_text(
        "sA,2025-01-01,00:00:10,1.5\nsB,2025-01-01,00:00:05,-3.25\n"
    )
    out = sorted(
        (r.series_id, str(r.ts), r.value)
        for r in read_ticks_csv(spark, str(p)).collect()
    )
    assert out == [
        ("sA", "2025-01-01 00:00:10", 1.5),
        ("sB", "2025-01-01 00:00:05", -3.25),
    ]
