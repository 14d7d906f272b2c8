"""Multi-resolution tiling — the hostname-tree analogue.

The reference re-groups the URL tree by hostname level-by-level
(make_hostname_tree, reference har2tree.py:680-708); here each feature is
assigned to its grid cell at every tile level, with the parent-level cell
alongside (FIXTURES.md tile_assignment). The assignment itself is a narrow
projection (cell res change is integer arithmetic — geo/grid.py), so it adds
ZERO shuffle; only the per-tile rollups aggregate.

``compact_cells`` is the H3 ``compactCells`` analogue: bottom-up replacement
of complete 4-child quartets by their parent cell, as a bounded driver loop
of groupBy passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from har2tree_spark.geo import grid


def tile_assignment(features: DataFrame, levels: tuple[int, ...] = grid.TILE_LEVELS) -> DataFrame:
    """One row per (span, level): (doc_id, span_idx, cell, level, parent_cell).
    parent_cell = the span's cell at the previous (coarser) level; null at
    the first level — mirroring hostname-tree parent hosts."""
    f = features.filter(F.col("cell").isNotNull())
    structs = []
    prev = None
    for lvl in levels:
        cur = grid.col_cell_parent(F.col("cell"), grid.FINE_RES, lvl) if lvl != grid.FINE_RES else F.col("cell")
        structs.append(
            F.struct(
                cur.alias("cell"),
                F.lit(lvl).alias("level"),
                (prev if prev is not None else F.lit(None).cast("long")).alias("parent_cell"),
            )
        )
        prev = cur
    return f.select(
        "doc_id",
        "span_idx",
        F.inline(F.array(*structs)),
    ).select("doc_id", "span_idx", "cell", "level", "parent_cell")


def tile_rollup(tiles: DataFrame) -> DataFrame:
    """Per-tile aggregate (HostNode rollup analogue, reference
    nodes.py:802-835): span count, doc count, child-tile fanout."""
    return (
        tiles.groupBy("level", "cell")
        .agg(
            F.count("*").alias("n_spans"),
            F.approx_count_distinct("doc_id").alias("n_docs"),
            F.first("parent_cell").alias("parent_cell"),
        )
    )


def tile_rollup_hierarchical(
    features: DataFrame, levels: tuple[int, ...] = grid.TILE_LEVELS
) -> DataFrame:
    """Scale-path rollup: aggregate ONCE at the finest level, then roll the
    (much smaller) per-cell aggregate up the hierarchy with integer parent
    arithmetic — the shuffle moves #distinct-fine-cells rows instead of
    n_levels x n_spans rows (4x less at the default 4 levels; the gap grows
    with level count). n_spans is exact; n_docs uses HLL sketches
    (hll_sketch_agg at the fine level, hll_union_agg upward), which merge
    losslessly across levels — estimates differ slightly from
    ``tile_rollup``'s per-level approx_count_distinct but carry the same
    accuracy class. Returns (level, cell, n_spans, n_docs)."""
    fine_res = max(levels)
    f = features.filter(F.col("cell").isNotNull())
    fine = (
        f.groupBy(grid.col_cell_parent(F.col("cell"), grid.FINE_RES, fine_res).alias("cell"))
        .agg(
            F.count("*").alias("n_spans"),
            F.hll_sketch_agg("doc_id").alias("sk"),
        )
    )
    parts = []
    cur = fine
    prev = fine_res
    for lvl in sorted(levels, reverse=True):
        if lvl != prev:
            cur = (
                cur.groupBy(
                    grid.col_cell_parent(F.col("cell"), prev, lvl).alias("cell")
                )
                .agg(
                    F.sum("n_spans").alias("n_spans"),
                    F.hll_union_agg("sk").alias("sk"),
                )
            )
            prev = lvl
        parts.append(
            cur.select(
                F.lit(lvl).cast("int").alias("level"),
                "cell",
                F.col("n_spans").cast("long").alias("n_spans"),
                F.hll_sketch_estimate("sk").cast("long").alias("n_docs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hot_cells(tiles: DataFrame, level: int, threshold_ratio: float = 0.01) -> DataFrame:
    """Cells holding more than ``threshold_ratio`` of all spans at a level —
    the mega-hostname-subtree detector (skew handling input)."""
    at = tiles.filter(F.col("level") == level)
    total = at.count()
    if total == 0:
        return at.select("cell").limit(0)
    return (
        at.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(max(1, int(total * threshold_ratio))))
        .select("cell", "n")
    )


def compact_cells(cells: DataFrame, res: int = grid.FINE_RES, min_res: int = 0) -> DataFrame:
    """H3 compactCells analogue over a distinct (doc_id, cell) set at a single
    resolution: any parent whose 4 children are ALL present replaces them;
    repeat up the hierarchy. Returns (doc_id, cell) of the compacted cover.
    Bounded loop of (res - min_res) aggregate passes."""
    out = cells.select("doc_id", "cell").distinct()
    result_parts = []
    cur = out
    for r in range(res, min_res, -1):
        parent = grid.col_cell_parent(F.col("cell"), r, r - 1)
        grouped = (
            cur.groupBy("doc_id", parent.alias("pcell"))
            .agg(F.count_distinct("cell").alias("nchild"))
        )
        promoted = grouped.filter(F.col("nchild") == 4).select(
            "doc_id", F.col("pcell").alias("cell")
        )
        # children of a promoted parent drop out at this level
        kept = (
            cur.withColumn("pcell", parent)
            .join(promoted.withColumnRenamed("cell", "pcell"), ["doc_id", "pcell"], "left_anti")
            .drop("pcell")
        )
        result_parts.append(kept)
        cur = promoted
    result_parts.append(cur)
    out = result_parts[0]
    for part in result_parts[1:]:
        out = out.unionByName(part)
    return out
