"""Per-document and per-cell aggregates — the capture-stats analogue.

Re-grounds the reference's ``stats`` property (reference har2tree.py:505-528;
golden values asserted at tests/simple_test.py:63-75), the HostNode rollups
(nodes.py:802-835, :735-760) and ``build_all_hashes`` (har2tree.py:550-569)
as single groupBy aggregates, plus a scalable pointer-doubling depth operator
for the tree-depth / redirect-chain figures (Spark has no recursion; depth
over parent pointers converges in ceil(log2(depth)) self-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from har2tree_spark.geo import grid


def compute_depths(
    join_result: DataFrame,
    max_doubling: int | None = None,
    depth_complete: bool | None = None,
) -> DataFrame:
    """(doc_id, span_idx, depth) from parent pointers.

    Exact-mode join results carry ``depth`` already (the DFS computes it for
    free) — pass through with zero jobs. Otherwise: pointer doubling; each
    pass jumps every node twice as far up its ancestor chain, so depth up to
    2^k resolves in k shuffles. The iteration count is bounded ONCE from the
    largest per-doc row count (one cheap agg) instead of a convergence
    action per pass — per-pass driver actions were the scaling bottleneck
    (fixed latency independent of cores).

    ``depth_complete`` is the path switch for frames that carry a ``depth``
    column: True = trust it (zero jobs), False = ignore it and re-derive by
    doubling. The default (None) probes ONE row and passes through iff it is
    non-null — correct only under the homogeneity PRECONDITION that
    ``depth`` is all-filled or all-null, which holds for every frame this
    package produces (exact mode fills every row, rank mode none). For a
    mixed frame (e.g. a caller's union of exact- and rank-mode results) the
    one-row probe is nondeterministic: pass ``depth_complete=False`` there,
    or the rank rows may silently keep their null depths."""
    if "depth" in join_result.columns and depth_complete is not False:
        if depth_complete is True:
            return join_result.select("doc_id", "span_idx", "depth")
        probe = join_result.select("depth").limit(1).collect()
        if probe and probe[0][0] is not None:
            return join_result.select("doc_id", "span_idx", "depth")
    if max_doubling is None:
        max_rows = (
            join_result.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
        )
        max_doubling = max(1, int(max_rows or 1).bit_length())
    cur = join_result.select(
        "doc_id",
        F.col("span_idx").alias("node"),
        F.col("parent_idx").alias("anc"),
        F.when(F.col("parent_idx") == -1, 0).otherwise(1).alias("steps"),
    ).localCheckpoint()
    for _ in range(max_doubling):
        cur = (
            cur.alias("a")
            .join(
                cur.select(
                    "doc_id",
                    F.col("node").alias("anc"),
                    F.col("anc").alias("anc2"),
                    F.col("steps").alias("steps2"),
                ).alias("b"),
                ["doc_id", "anc"],
                "left",
            )
            .select(
                "doc_id",
                "node",
                F.coalesce(F.col("anc2"), F.col("anc")).alias("anc"),
                (F.col("steps") + F.coalesce(F.col("steps2"), F.lit(0))).alias("steps"),
            )
            .localCheckpoint()
        )
    return cur.select("doc_id", F.col("node").alias("span_idx"), F.col("steps").alias("depth"))


def doc_stats(
    features: DataFrame,
    join_result: DataFrame,
    depth_complete: bool | None = None,
) -> DataFrame:
    """Golden per-doc stats (DOC_STATS_SCHEMA; A4 analogue).

    ``depth_complete`` is forwarded to :func:`compute_depths`. Pass False
    when ``join_result`` carries a partially stale ``depth`` column — e.g.
    after ``pages.attach_pages``, which re-parents rows and nulls only
    THEIR depths, leaving descendants' depths stale — so tree_depth is
    re-derived from the new parent pointers instead of read from the
    mixed column (r7 ADVICE #1)."""
    f = features.filter(F.col("span_idx").isNotNull() & (F.col("n_live") > 0))
    base = f.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("total_spans"),
        F.count_distinct("key").cast("int").alias("unique_keys"),
        F.count(F.col("cell")).cast("int").alias("total_cells"),
        F.count_distinct("cell").cast("int").alias("unique_cells"),
        F.sum("nbytes").cast("long").alias("total_bytes"),
    )
    chains = join_result.groupBy("doc_id").agg(
        F.sum(F.when(F.col("join_kind") == "redirect", 1).otherwise(0))
        .cast("int")
        .alias("total_chain")
    )
    depths = (
        compute_depths(join_result, depth_complete=depth_complete)
        .groupBy("doc_id")
        .agg((F.max("depth") + 1).cast("int").alias("tree_depth"))
    )
    return (
        base.join(chains, "doc_id", "left")
        .join(depths, "doc_id", "left")
        .select(
            "doc_id",
            "total_spans",
            "unique_keys",
            "total_cells",
            "unique_cells",
            F.coalesce("tree_depth", F.lit(0)).alias("tree_depth"),
            F.coalesce("total_chain", F.lit(0)).alias("total_chain"),
            "total_bytes",
        )
    )


def cell_rollup(features: DataFrame, res: int = grid.COARSE_RES) -> DataFrame:
    """HostNode rollup analogue (nodes.py:802-835 + derived counts
    :735-760): per (doc, coarse cell): member keys, span count, distinct
    keys, media/text mix flags (the http/https mixed_content analogue)."""
    f = features.filter(F.col("cell").isNotNull())
    cell = grid.col_cell_parent(F.col("cell"), grid.FINE_RES, res).alias("cell")
    has_media = F.max(
        F.when(F.col("kind").isin("img", "video", "audio"), 1).otherwise(0)
    )
    has_text = F.max(F.when(F.col("kind").isin("text", "html", "css", "js"), 1).otherwise(0))
    return (
        f.groupBy("doc_id", cell)
        .agg(
            F.count("*").cast("int").alias("n_spans"),
            F.count_distinct("key").cast("int").alias("n_keys"),
            F.sort_array(F.collect_set("key")).alias("keys"),
            has_media.cast("boolean").alias("has_media"),
            has_text.cast("boolean").alias("has_text"),
            (has_media + has_text == 2).alias("mixed_content"),
            F.sum("nbytes").cast("long").alias("total_bytes"),
        )
    )


def hash_groups(features: DataFrame) -> DataFrame:
    """build_all_hashes analogue (har2tree.py:550-569): group spans by
    content digest -> member list."""
    f = features.filter(F.col("text") != "")
    return (
        f.select("doc_id", "span_idx", F.sha2(F.col("text"), 256).alias("body_hash"))
        .groupBy("body_hash")
        .agg(
            F.count("*").cast("int").alias("n_spans"),
            F.count_distinct("doc_id").cast("int").alias("n_docs"),
        )
    )


def redirect_chains(
    features: DataFrame,
    join_result: DataFrame,
    depth_complete: bool | None = None,
) -> DataFrame:
    """Redirect-chain listing per doc (the ``redirects`` property analogue,
    har2tree.py:530-533): redirect-edge members ordered root-to-leaf.
    ``chain_len`` counts redirect EDGES anywhere in the tree — a whole-tree
    figure, deliberately broader than the reference's ``redirects`` list
    (which is the root->rendered-node path only; r7 ADVICE #3 documents
    the divergence). ``depth_complete`` as in :func:`doc_stats`."""
    red = join_result.filter(F.col("join_kind") == "redirect")
    d = compute_depths(join_result, depth_complete=depth_complete)
    d = d.withColumnRenamed("depth", "d")
    return (
        red.join(d, ["doc_id", "span_idx"])
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("span_idx")))
                ),
                lambda s: s["span_idx"],
            ).alias("chain"),
            F.count("*").cast("int").alias("chain_len"),
        )
    )
