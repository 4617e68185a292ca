from __future__ import annotations

import numpy as np
import pandas as pd


def assert_frames_equal(spark_df, oracle_pdf, sort_cols, float_cols=(),
                        rtol=1e-9, atol=1e-12):
    """Exact-match compare of a Spark result vs a pandas oracle.

    Non-float columns must be identical; float columns compared with a
    tight tolerance (summation-order fp wiggle only).
    """
    got = spark_df.toPandas()
    want = oracle_pdf.copy()
    assert sorted(got.columns) == sorted(want.columns), (
        got.columns, want.columns)
    got = got.sort_values(list(sort_cols)).reset_index(drop=True)
    want = want.sort_values(list(sort_cols)).reset_index(drop=True)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for c in want.columns:
        if c in float_cols:
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
                rtol=rtol, atol=atol, err_msg=f"column {c}",
                equal_nan=True,
            )
        else:
            pd.testing.assert_series_equal(
                got[c], want[c], check_names=False, check_dtype=False,
                obj=f"column {c}",
            )
