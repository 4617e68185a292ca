"""timeseriescorrelation_spark — a from-scratch PySpark-native time-series
rollup + downsample + retention engine over tables of multi-turn
conversation/agent transcripts, with the query capabilities of the
reference repo GeoMSK/TimeSeriesCorrelation (dataset normalization,
bucketed pruning, pairwise Pearson-correlation reports) re-expressed as
continuous aggregates on the Spark DataFrame API.

Spec provenance: /root/repo/BASELINE.json (north_star:6, north_rule:14,
input_hint:15) and /root/repo/SURVEY.md. The reference tree at
/root/reference is empty in this sandbox; no reference code is copied.
"""

__version__ = "0.1.0"
