"""zlib compressibility + charset composition."""

from __future__ import annotations

import zlib

import pytest

from timeseriescorrelation_spark.operators.textstats import (
    charset_report,
    doc_compressibility,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_compressibility_orders_template_below_noise(spark):
    import hashlib

    template = "the same line again and again. " * 50
    noisy = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(24)
    )
    out = {
        r["doc_id"]: r
        for r in doc_compressibility(
            _docs(spark, [(1, "s", template), (2, "s", noisy)])
        ).collect()
    }
    assert out[1]["ratio"] < 0.1
    assert out[2]["ratio"] > 0.4
    assert out[2]["ratio"] > 4 * out[1]["ratio"]
    # exact against stdlib zlib
    assert out[1]["z_bytes"] == len(
        zlib.compress(template.encode("utf-8"), 6)
    )


def test_compressibility_empty_text_null_ratio(spark):
    out = doc_compressibility(_docs(spark, [(1, "s", "")])).collect()[0]
    assert out["n_bytes"] == 0 and out["ratio"] is None


def test_charset_hand_shares(spark):
    out = charset_report(
        _docs(spark, [(1, "s", "ab1 c!"), (2, "s", "xy2 z?")])
    ).collect()[0]
    # per doc: 3 letters, 1 digit, 1 space, 1 punct; x2 docs, 12 chars
    assert out["n_chars"] == 12
    assert out["letter_share"] == pytest.approx(6 / 12, abs=1e-6)
    assert out["digit_share"] == pytest.approx(2 / 12, abs=1e-6)
    assert out["space_share"] == pytest.approx(2 / 12, abs=1e-6)
    assert out["punct_share"] == pytest.approx(2 / 12, abs=1e-6)
    assert out["nonascii_share"] == 0.0


def test_charset_nonascii_detected(spark):
    out = charset_report(_docs(spark, [(1, "s", "héllo")])).collect()[0]
    assert out["nonascii_share"] > 0.0
    shares = (out["letter_share"] + out["digit_share"]
              + out["space_share"] + out["nonascii_share"]
              + out["punct_share"])
    assert shares == pytest.approx(1.0, abs=1e-5)
