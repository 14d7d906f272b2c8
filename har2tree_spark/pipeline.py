"""End-to-end pipeline: documents -> features -> cascade -> tiles -> stats.

The flagship flow (reference CrawledTree lifecycle, SURVEY.md §3) with
per-stage lineage. Shuffle budget at scale:

  parse          narrow (array-level ops)            0 shuffles
  cascade exact  groupBy(doc_id) applyInPandas       1 shuffle (none if the
                                                     source is bucketed/
                                                     partitioned by doc_id)
  tiles          narrow projection                   0 shuffles
  tile_rollup    groupBy(level, cell)                1 shuffle (AQE-skew
                                                     aware; hot cells salted)
  doc_stats      groupBy(doc_id)                     co-partitioned with
                                                     cascade output
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from har2tree_spark.operators import cascade, parse, stats, tiling


def run_pipeline(
    docs: DataFrame,
    mode: str = "exact",
    with_depths: bool = True,
) -> dict[str, DataFrame]:
    """Returns the engine's output tables. ``mode``: 'exact' (reference
    parity, applyInPandas kernel) or 'rank' (single-window relational)."""
    features = parse.parse_documents(docs)
    join_result = (
        cascade.resolve_exact(features) if mode == "exact" else cascade.resolve_rank(features)
    )
    tiles = tiling.tile_assignment(features)
    out: dict[str, DataFrame] = {
        "features": features,
        "join_result": join_result,
        "tiles": tiles,
        "tile_rollup": tiling.tile_rollup(tiles),
        "quarantine": features.filter(F.col("n_live") == 0).select("doc_id").distinct(),
    }
    if with_depths:
        out["doc_stats"] = stats.doc_stats(features, join_result)
    # span-sequence invariant surface: the document rows pass through
    # untouched, joined with their computed root — proving the engine only
    # re-parents, never mutates/reorders spans (BASELINE.json input_hint)
    out["enriched_documents"] = docs.join(
        features.select("doc_id", "root_idx").distinct(), "doc_id", "left"
    )
    return out


def run_and_measure(
    spark: SparkSession, docs: DataFrame, mode: str = "exact"
) -> dict[str, float]:
    """Materialize the pipeline, returning docs/sec throughput — the
    BASELINE.md headline metric."""
    t0 = time.time()
    out = run_pipeline(docs, mode=mode, with_depths=True)
    n_join = out["join_result"].count()
    n_tiles = out["tile_rollup"].count()
    n_stats = out["doc_stats"].count()
    wall = time.time() - t0
    return {
        "docs": float(n_stats),
        "join_rows": float(n_join),
        "tiles": float(n_tiles),
        "wall_s": wall,
        "docs_per_sec": n_stats / wall if wall > 0 else 0.0,
    }
