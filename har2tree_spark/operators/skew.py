"""Skew handling: hot-cell detection + salting + range repartitioning.

The mega-hostname-subtree analogue (reference har2tree.py:680-708 grouping):
a handful of cells hold a large share of all features (the generator's
zipf hot-key pool models this). Three mitigations, composable:

  * AQE skew-join splitting — enabled by default in session.py
    (spark.sql.adaptive.skewJoin.enabled);
  * explicit salting for aggregations: ``salted_cell_counts`` does the
    classic two-phase aggregate (partial per salt, then merge) so one hot
    cell spreads over S reducers;
  * ``repartition_by_cell_range`` — adaptive range partitioning on the
    cell id for sorted/tiled output (Iceberg write.distribution-mode=range
    analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, cols: tuple[str, ...] = ("doc_id", "span_idx")) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of stable id columns (no
    rand() — keeps retries/resume deterministic)."""
    return df.withColumn("salt", F.pmod(F.hash(*cols), F.lit(buckets)))


def salted_cell_counts(features: DataFrame, buckets: int = 16) -> DataFrame:
    """count(*) and count_distinct(doc) per cell via two-phase salted
    aggregation: groupBy(cell, salt) partials, then groupBy(cell) merge.
    The hot cell's rows land on ``buckets`` reducers instead of one."""
    f = features.filter(F.col("cell").isNotNull())
    partial = (
        with_salt(f, buckets)
        .groupBy("cell", "salt")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("doc_id").alias("nd"),
        )
    )
    return partial.groupBy("cell").agg(
        F.sum("n").cast("long").alias("n_spans"),
        F.sum("nd").cast("long").alias("n_docs_approx"),
    )


def repartition_by_cell_range(df: DataFrame, partitions: int) -> DataFrame:
    """Range-repartition on the cell id: co-locates spatially adjacent
    cells per output partition (tile-locality for the sink) while the
    range sampler balances hot ranges."""
    return df.repartitionByRange(partitions, F.col("cell"))
