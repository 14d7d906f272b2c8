"""Spatial fallback + generic geospatial join operators.

Re-grounds the reference's fallback attachment cascade
(_make_subtree_fallback, reference har2tree.py:770-853) relationally:

  * ``fallback_host``  — coarse-cell equi-join + preference window (J10);
  * ``pip_join``       — broadcast R-tree point-in-polygon via ray casting
                         (J11/J12 page-region containment): the polygon side
                         is small per north_star, so it broadcasts; the probe
                         runs inside ``mapInPandas`` with numpy ray casting —
                         the only Python stage, Arrow-batched, no per-row
                         Python;
  * ``knn_join``       — cell-ring-expansion kNN (J13) as ONE equi-join:
                         explode the (2R+1)^2 neighbor-cell disk of each
                         probe (pure integer column arithmetic, JVM-side),
                         equi-join on the neighbor cell, rank by (ring,
                         squared grid distance). No iteration, no UDF.

``resolve_with_fallbacks`` chains them on top of rank-mode resolution:
unmatched spans try host-cell, then kNN, then root — the relational
counterpart of the sequential fallback loop (exact mode implements the
reference-faithful sequential semantics in operators/kernel.py; the two
contracts differ only in visit order, documented there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from har2tree_spark.geo import grid
from har2tree_spark.geo.geometry import points_in_polygon
from har2tree_spark.geo.rtree import STRtree
from har2tree_spark.schema import PRIORITY

_IY = 1 << 16
_RB = 32


def _cell_parts(cell):
    rest = F.floor(cell / F.lit(_RB))
    return F.floor(rest / F.lit(_IY)), F.pmod(rest, F.lit(_IY))


def neighbor_cells(df: DataFrame, cell_col: str, radius: int, res: int = grid.FINE_RES) -> DataFrame:
    """Explode each row into its (2r+1)^2 neighbor cells (toroidal wrap),
    adding ``nbr_cell`` and ``ring`` (Chebyshev distance) and ``d2``
    columns — all integer column arithmetic, whole-stage-codegen'd."""
    n = 1 << res
    offs = [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]
    ix, iy = _cell_parts(F.col(cell_col))
    out = df.withColumn("_o", F.explode(F.array(*offs)))
    dx = F.col("_o.dx")
    dy = F.col("_o.dy")
    nbr = (
        (F.pmod(ix + dx, F.lit(n)) * F.lit(_IY) + F.pmod(iy + dy, F.lit(n)))
        * F.lit(_RB)
        + F.lit(res)
    ).cast("long")
    return (
        out.withColumn("nbr_cell", nbr)
        .withColumn("ring", F.greatest(F.abs(dx), F.abs(dy)))
        .withColumn("d2", (dx * dx + dy * dy).cast("long"))
        .drop("_o")
    )


def _disk_knn(
    probes: DataFrame,
    candidates: DataFrame,
    k: int,
    radius: int,
    res: int,
    keys: list[str],
    exclude_self: bool,
) -> DataFrame:
    """Single-pass disk kNN: explode the (2r+1)^2 neighbor disk of each
    probe, equi-join on the neighbor cell, rank by (ring, d2)."""
    p = neighbor_cells(
        probes.select(*keys, "probe_id", F.col("cell").alias("_pc")),
        "_pc",
        radius,
        res,
    )
    c = candidates.select(*keys, "cand_id", F.col("cell").alias("nbr_cell"), "cand_offset")
    j = p.join(c, [*keys, "nbr_cell"])
    if exclude_self:
        # when probes and candidates are the same id space, a probe's own
        # row is always its rank-1 neighbor — drop it BEFORE ranking
        j = j.filter(F.col("probe_id") != F.col("cand_id"))
    w = Window.partitionBy(*keys, "probe_id").orderBy(
        "ring", "d2", "cand_offset", "cand_id"
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*keys, "probe_id", "cand_id", "ring", "d2", "rk")
    )


def knn_join(
    probes: DataFrame,
    candidates: DataFrame,
    k: int = 1,
    max_ring: int = 4,
    res: int = grid.FINE_RES,
    doc_local: bool = True,
    exclude_self: bool = False,
    two_phase: bool = False,
) -> DataFrame:
    """k nearest candidate rows per probe by grid distance, searching the
    ring expansion up to ``max_ring``. probes needs (doc_id?, probe_id,
    cell); candidates needs (doc_id?, cand_id, cell). Returns one row per
    (probe, rank<=k) that found a neighbor.

    two_phase=False (default): one shuffle total — the disk explode is
    narrow; the equi-join on (doc_id?, cell) hashes both sides once. The
    (2R+1)^2 replication lands on the probe side only, which wins when
    probes << candidates (the fallback-cascade case).

    two_phase=True: for self-kNN (probes ≈ candidates) the full-disk
    explode would amplify the WHOLE table (81x at R=4). Phase 1 searches
    only radius 1 (9 cells, where grid locality puts almost every nearest
    neighbor); probes with >= k matches there are globally correct (any
    farther candidate has a larger ring). Only the unmatched remainder
    re-runs at the full radius, so the expected shuffle amplification is
    ~9x + 81x * (unmatched fraction). Result-identical to single-pass."""
    keys = ["doc_id"] if doc_local else []
    if not two_phase or max_ring <= 1:
        return _disk_knn(probes, candidates, k, max_ring, res, keys, exclude_self)
    r1 = _disk_knn(probes, candidates, k, 1, res, keys, exclude_self)
    done = (
        r1.groupBy(*keys, "probe_id")
        .agg(F.count("*").alias("_nm"))
        .filter(F.col("_nm") >= k)
        .select(*keys, "probe_id")
    )
    r1_done = r1.join(done, [*keys, "probe_id"], "left_semi")
    rest = probes.join(done, [*keys, "probe_id"], "left_anti")
    r2 = _disk_knn(rest, candidates, k, max_ring, res, keys, exclude_self)
    return r1_done.unionByName(r2)


def pip_join(
    points: DataFrame,
    polygons: list[tuple],
    keep_cols: tuple[str, ...] = ("doc_id", "span_idx"),
    prune_res: int | None = 4,
) -> DataFrame:
    """Broadcast R-tree point-in-polygon join. ``polygons`` is a driver-side
    list of (poly_id, vertices) with vertices an (m, 2) array-like — the
    small/broadcastable side (tile boundaries, page regions). Returns one
    row per (point, containing polygon).

    Plan shape: (1) optional S2-style covering prune — the union of the
    polygons' bbox coverings at ``prune_res`` becomes a JVM-side `isin`
    filter on the point's cell, so points nowhere near any polygon never
    reach Python; (2) R-tree built once on the driver, broadcast; (3) probe
    in a mapInPandas stage (numpy ray casting per Arrow batch) — no
    shuffle, no per-row Python."""
    spark = points.sparkSession
    polys = [(pid, np.asarray(v, dtype=np.float64)) for pid, v in polygons]
    if prune_res is not None and polys:
        cover: set[int] = set()
        for _, v in polys:
            cover.update(
                grid.np_cover_bbox(
                    float(v[:, 0].min()), float(v[:, 1].min()),
                    float(v[:, 0].max()), float(v[:, 1].max()),
                    max_cells=64, max_res=prune_res,
                ).tolist()
            )
        # the cover is mixed-resolution (compacted): a point survives if its
        # cell at ANY cover resolution is in the cover's cells of that res
        conds = []
        for r in range(0, prune_res + 1):
            cells_r = [c for c in cover if c % 32 == r]
            if cells_r:
                conds.append(
                    grid.col_cell_lonlat(F.col("lon"), F.col("lat"), r).isin(cells_r)
                )
        if conds:
            cond = conds[0]
            for extra in conds[1:]:
                cond = cond | extra
            points = points.filter(cond)
    boxes = np.asarray(
        [
            [v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max()]
            for _, v in polys
        ]
    ).reshape(-1, 4)
    bc = spark.sparkContext.broadcast((polys, boxes))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in points.select(*keep_cols).schema.fields
    ) + ", poly_id string"

    def probe(batches):
        polys_l, boxes_l = bc.value
        tree = STRtree(boxes_l)
        cols = list(keep_cols)
        for pdf in batches:
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            # vectorized bbox pairs, then ONE ray cast per candidate polygon
            # over all of its probe points (no per-row Python)
            pt, box = tree.query_pairs(lon, lat)
            hit_rows: list[np.ndarray] = []
            hit_pids: list[str] = []
            for ci in np.unique(box):
                pts = pt[box == ci]
                pid, verts = polys_l[int(ci)]
                inside = points_in_polygon(lon[pts], lat[pts], verts)
                kept = pts[inside]
                hit_rows.append(kept)
                hit_pids.extend([pid] * len(kept))
            if hit_rows:
                idx = np.concatenate(hit_rows)
                out = pdf.iloc[idx][cols].copy()
                out["poly_id"] = hit_pids
            else:
                out = pdf.iloc[:0][cols].copy()
                out["poly_id"] = pd.Series(dtype="object")
            yield out

    return points.select(*keep_cols, "lon", "lat").mapInPandas(probe, out_schema)


def resolve_with_fallbacks(
    features: DataFrame, base: DataFrame, max_ring: int = 4
) -> DataFrame:
    """Upgrade rank-mode 'fallback_root' assignments with the spatial
    fallback cascade: coarse-cell host match first, then ring-kNN over
    attached spans, then root (the relational J10->J13 chain)."""
    f = features.filter(F.col("span_idx").isNotNull() & (F.col("n_live") > 0))
    unmatched = base.filter(F.col("join_kind") == "fallback_root").select(
        "doc_id", "span_idx"
    )
    attached = base.filter(F.col("join_kind") != "fallback_root").select(
        "doc_id", F.col("span_idx").alias("a_idx")
    )
    fa = attached.join(
        f.select(
            "doc_id",
            F.col("span_idx").alias("a_idx"),
            F.col("coarse_cell").alias("a_coarse"),
            F.col("cell").alias("a_cell"),
            F.col("kind").alias("a_kind"),
            F.col("offset").alias("a_offset"),
        ),
        ["doc_id", "a_idx"],
    )
    un = unmatched.join(
        f.select("doc_id", "span_idx", "coarse_cell", "cell", "offset", "root_idx"),
        ["doc_id", "span_idx"],
    )

    # stage 1: fallback_host — same coarse cell, prefer html then earliest
    host = (
        un.join(fa, (un["doc_id"] == fa["doc_id"]) & (un["coarse_cell"] == fa["a_coarse"]))
        .drop(fa["doc_id"])
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id", "span_idx").orderBy(
                    F.expr("a_kind != 'html'"), "a_offset", "a_idx"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "span_idx",
            F.col("a_idx").alias("parent_idx"),
            F.lit("fallback_host").alias("join_kind"),
            F.lit(PRIORITY["fallback_host"]).alias("priority"),
        )
    )

    # stage 2: fallback_knn over remaining
    rem = un.join(host.select("doc_id", "span_idx"), ["doc_id", "span_idx"], "left_anti")
    knn = knn_join(
        rem.select("doc_id", F.col("span_idx").alias("probe_id"), "cell"),
        fa.select(
            "doc_id",
            F.col("a_idx").alias("cand_id"),
            F.col("a_cell").alias("cell"),
            F.col("a_offset").alias("cand_offset"),
        ),
        k=1,
        max_ring=max_ring,
    ).select(
        "doc_id",
        F.col("probe_id").alias("span_idx"),
        F.col("cand_id").alias("parent_idx"),
        F.lit("fallback_knn").alias("join_kind"),
        F.lit(PRIORITY["fallback_knn"]).alias("priority"),
    )

    # stage 3: root for whatever remains
    rem2 = rem.join(knn.select("doc_id", "span_idx"), ["doc_id", "span_idx"], "left_anti")
    root = rem2.select(
        "doc_id",
        "span_idx",
        F.col("root_idx").alias("parent_idx"),
        F.lit("fallback_root").alias("join_kind"),
        F.lit(PRIORITY["fallback_root"]).alias("priority"),
    )

    kept = base.filter(F.col("join_kind") != "fallback_root")
    return (
        kept.unionByName(host, allowMissingColumns=True)
        .unionByName(knn, allowMissingColumns=True)
        .unionByName(root, allowMissingColumns=True)
        .select("doc_id", "span_idx", "parent_idx", "join_kind", "priority")
    )
