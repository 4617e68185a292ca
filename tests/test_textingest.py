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


def test_jsonl_transcripts_quarantine_not_drop(spark, tmp_path):
    from timeseriescorrelation_spark.sources.textingest import (
        read_transcripts_jsonl,
    )

    p = tmp_path / "t.jsonl"
    p.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2024-01-01T00:00:00"}\n'
        '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"yo",'
        '"tool":"search","ts":"2024-01-01T00:00:05.123456"}\n'
        "this is not json at all\n"
    )
    out = read_transcripts_jsonl(spark, str(p)).collect()
    assert len(out) == 3  # malformed line quarantined, NOT dropped
    ok = [r for r in out if not r.malformed]
    bad = [r for r in out if r.malformed]
    assert len(ok) == 2 and len(bad) == 1
    assert bad[0]._raw.startswith("this is not json")
    turn1 = next(r for r in ok if r.turn_idx == 1)
    assert turn1.tool == "search"
    assert turn1.ts.microsecond == 123456
