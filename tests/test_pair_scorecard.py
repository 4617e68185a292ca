"""pair_scorecard composition invariants: the flagship view is a
left-join composition of nine already-gated pair aggregates, so the
risks are join fan-out (duplicate pair rows) and transfer-entropy
orientation flips — both asserted here on the sf0.001 tables."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod
from timeseriescorrelation_spark.operators.causality import transfer_entropy
from timeseriescorrelation_spark.operators.crossmetric import ccc_pairs

SF = "/root/testdata/sf0.001"


def test_pair_scorecard_no_fanout_and_te_orientation(spark):
    card = entrymod.q_pair_scorecard(spark, SF).toPandas()

    # one row per unordered pair, ordered a < b, no join fan-out
    assert (card["metric_a"] < card["metric_b"]).all()
    pairs = list(zip(card["metric_a"], card["metric_b"]))
    assert len(pairs) == len(set(pairs))

    series = entrymod._series_from_events(spark, SF)
    base = ccc_pairs(series).toPandas()
    assert len(card) == len(base)

    # transfer entropy: te_fwd is a->b, te_bwd is b->a, verbatim from
    # the gated transfer_entropy rows
    te = transfer_entropy(series).toPandas()
    te_map = {
        (r.metric_x, r.metric_y): r.te_nats for r in te.itertuples()
    }
    for r in card.itertuples():
        want_fwd = te_map.get((r.metric_a, r.metric_b))
        want_bwd = te_map.get((r.metric_b, r.metric_a))
        for got, want in ((r.te_fwd, want_fwd), (r.te_bwd, want_bwd)):
            if want is None or (isinstance(want, float) and math.isnan(want)):
                assert got is None or (
                    isinstance(got, float) and math.isnan(got)
                )
            else:
                assert got == want
