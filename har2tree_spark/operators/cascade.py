"""The consume-once join cascade (the heart of the engine).

The reference builds its tree with a priority-ordered cascade of hash joins
from parent candidates to unattached entries, where each successful join
consumes the child so weaker joins can't claim it (reference
har2tree.py:879-1014; consumption at :924, :958, :968, :987, :1011).

Two resolution modes:

  * ``resolve_rank`` — fully relational: union the candidate edges of all
    five stages, then one window (`row_number` per child ordered by stage
    priority, parent offset) picks each child's winner. Single-pass,
    SQL-expressible (the driver's DuckDB oracle runs the same statement),
    and the idiomatic at-scale plan: every join is an equi-join keyed by
    (doc_id, feature-key) so AQE can pick broadcast/skew variants.
    It deliberately relaxes the reference's DFS *visit order* to a
    per-child priority order — the consume-once guarantee (each child
    attached exactly once, strongest claim wins) is preserved.

  * ``resolve_exact`` — reference-parity sequential semantics: the per-doc
    DFS with true consume-once ordering and the spatial fallback cascade,
    run as a vectorized kernel inside ``applyInPandas`` (docs are
    independent and small — the natural unit of parallelism at 10^12-doc
    scale; there is no cross-doc dataflow, so this parallelizes linearly).
    Matches the pure-Python oracle (oracle/pycascade.py) bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from har2tree_spark.schema import JOIN_RESULT_SCHEMA, PRIORITY

_BIG = 1 << 31


def live_features(features: DataFrame) -> DataFrame:
    """Surviving spans only (drops quarantined-doc placeholder rows)."""
    return features.filter(F.col("span_idx").isNotNull() & (F.col("n_live") > 0))


def candidate_edges(
    features: DataFrame, materialize: bool = False, dedup: bool = True
) -> DataFrame:
    """Union of candidate (child, parent, stage) edges for the five cascade
    stages — each an equi-join on (doc_id, key). Returns columns:
    doc_id, child_idx, parent_idx, join_kind, priority, p_offset, root_idx.

    materialize: persist ONE slim projection (drops the text/geometry
    columns; keeps the join scalars + ref_tokens) that all five joins fan
    out from — a single upstream evaluation instead of one per branch,
    without paying to cache the full feature table. The token explode runs
    once instead of once per stage."""
    f = live_features(features)
    if materialize:
        f = f.select(
            "doc_id", "span_idx", "kind", "media_ref", "offset",
            "key", "valid", "root_idx", "ref_tokens",
        ).persist()
    child = f.select(
        "doc_id",
        F.col("span_idx").alias("child_idx"),
        F.col("kind").alias("c_kind"),
        F.col("media_ref").alias("c_media"),
        F.col("key").alias("c_key"),
        F.col("offset").alias("c_offset"),
        F.col("valid").alias("c_valid"),
        "root_idx",
    )
    parent = f.select(
        "doc_id",
        F.col("span_idx").alias("parent_idx"),
        F.col("kind").alias("p_kind"),
        F.col("media_ref").alias("p_media"),
        F.col("key").alias("p_key"),
        F.col("offset").alias("p_offset"),
    )
    p_tok = f.select(
        "doc_id",
        F.col("span_idx").alias("parent_idx"),
        F.col("kind").alias("p_kind"),
        F.col("offset").alias("p_offset"),
        F.col("key").alias("p_key"),
        F.explode("ref_tokens").alias("tok"),
    )
    not_self = F.col("child_idx") != F.col("parent_idx")

    # J2 redirect: parent.media_ref -> child.key, prefix-to-first-valid
    redirect = (
        parent.filter((F.col("p_kind") == "redirect") & (F.col("p_media") != ""))
        .join(
            child,
            ["doc_id"],
        )
        .filter(
            (F.col("c_key") == F.col("p_media"))
            & not_self
            & ~F.col("c_key").eqNullSafe(F.col("p_key"))
        )
    )
    w_red = Window.partitionBy("doc_id", "parent_idx").orderBy("c_offset", "child_idx")
    rn = F.row_number().over(w_red)
    first_valid = F.min(F.when(F.col("c_valid"), rn)).over(
        Window.partitionBy("doc_id", "parent_idx")
    )
    redirect = (
        redirect.withColumn("rn", rn)
        .withColumn("fv", first_valid)
        .filter(F.col("rn") <= F.coalesce(F.col("fv"), F.lit(_BIG)))
        .withColumn("join_kind", F.lit("redirect"))
    )

    # J3 frame: iframe parent's text tokens -> child.key
    frame = (
        p_tok.filter(F.col("p_kind") == "iframe")
        .join(child, ["doc_id"])
        .filter((F.col("c_key") == F.col("tok")) & not_self)
        .withColumn("join_kind", F.lit("frame"))
    )

    # J4 initiator: js child's media_ref -> parent.key
    initiator = (
        child.filter((F.col("c_kind") == "js") & (F.col("c_media") != ""))
        .join(parent.filter(F.col("p_key").isNotNull()), ["doc_id"])
        .filter((F.col("c_media") == F.col("p_key")) & not_self)
        .withColumn("join_kind", F.lit("initiator"))
    )

    # J5 referer: non-js child's media_ref -> parent.key
    referer = (
        child.filter((F.col("c_kind") != "js") & (F.col("c_media") != ""))
        .join(parent.filter(F.col("p_key").isNotNull()), ["doc_id"])
        .filter((F.col("c_media") == F.col("p_key")) & not_self)
        .withColumn("join_kind", F.lit("referer"))
    )

    # J6 resource: html/css/js parent's text tokens -> child.key, child has
    # no referer of its own (the "unresolvable referer" guard, J6)
    resource = (
        p_tok.filter(F.col("p_kind").isin("html", "css", "js"))
        .join(child.filter(F.col("c_media") == ""), ["doc_id"])
        .filter((F.col("c_key") == F.col("tok")) & not_self)
        .withColumn("join_kind", F.lit("resource"))
    )

    cols = ["doc_id", "child_idx", "parent_idx", "join_kind", "p_offset", "root_idx"]
    edges = (
        redirect.select(*cols)
        .unionByName(frame.select(*cols))
        .unionByName(initiator.select(*cols))
        .unionByName(referer.select(*cols))
        .unionByName(resource.select(*cols))
    )
    if dedup:
        # token fan-out (frame/resource) can emit the same edge once per
        # matching token; callers that consume raw edges want set semantics.
        # resolve_rank skips this shuffle: duplicate edges are bit-identical
        # in every ranked column, so a row_number()==1 winner is invariant.
        edges = edges.dropDuplicates(
            ["doc_id", "child_idx", "parent_idx", "join_kind"]
        )
    prio = F.col("join_kind")
    prio_expr = (
        F.when(prio == "redirect", PRIORITY["redirect"])
        .when(prio == "frame", PRIORITY["frame"])
        .when(prio == "initiator", PRIORITY["initiator"])
        .when(prio == "referer", PRIORITY["referer"])
        .otherwise(PRIORITY["resource"])
    )
    return edges.withColumn("priority", prio_expr.cast("int"))


def resolve_rank(
    features: DataFrame, edges: DataFrame | None = None, materialize: bool = True
) -> DataFrame:
    """Single-window consume-once resolution (rank mode). Children with no
    candidate edge fall to 'fallback_root' (the spatial fallback stages are
    applied by operators.fallback on top of this). Returns
    JOIN_RESULT_SCHEMA columns.

    materialize: persist one slim projection of the live features (no text/
    geometry columns) that the five candidate joins AND the roots/unmatched
    branches all fan out from — a single upstream evaluation. At cluster
    scale this is the table the features stage writes to storage."""
    if materialize and edges is None:
        # EAGER localCheckpoint, not persist(): (a) a lazy persist lets the
        # five join branches of one cold job race to compute the uncached
        # upstream concurrently (measured ~5x the upstream cost); (b) a
        # persist() entry lives in the CacheManager until someone calls
        # unpersist, so repeated invocations on a long-lived driver (bench,
        # streaming foreachBatch) accumulate cached tables — checkpoint
        # blocks are freed by the ContextCleaner when the frame is GC'd.
        features = live_features(features).select(
            "doc_id", "span_idx", "kind", "media_ref", "offset",
            "key", "valid", "root_idx", "ref_tokens", "n_live",
        ).localCheckpoint()
    f = live_features(features).select("doc_id", "span_idx", "root_idx")
    if edges is None:
        edges = candidate_edges(features, materialize=False, dedup=False)
    # spans with no candidate edge fall to the doc root: modeled as a
    # synthetic lowest-priority edge per non-root span rather than a
    # left-anti join against the winners — the anti-join variant makes the
    # whole 5-join cascade subtree a 2x common subexpression (Spark does
    # not dedup it: the full edge plan executed once under the window and
    # once under the anti-join), and adds a shuffle of its own. One union +
    # one window does it in a single pass.
    fallback = f.filter(F.col("span_idx") != F.col("root_idx")).select(
        "doc_id",
        F.col("span_idx").alias("child_idx"),
        F.col("root_idx").alias("parent_idx"),
        F.lit("fallback_root").alias("join_kind"),
        F.lit(_BIG).alias("p_offset"),
        "root_idx",
        F.lit(PRIORITY["fallback_root"]).cast("int").alias("priority"),
    )
    w = Window.partitionBy("doc_id", "child_idx").orderBy(
        "priority", "p_offset", "parent_idx"
    )
    won = (
        edges.filter(F.col("child_idx") != F.col("root_idx"))
        .unionByName(fallback)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("child_idx").alias("span_idx"),
            F.col("parent_idx"),
            "join_kind",
            "priority",
        )
    )
    roots = f.filter(F.col("span_idx") == F.col("root_idx")).select(
        "doc_id",
        "span_idx",
        F.lit(-1).alias("parent_idx"),
        F.lit("root").alias("join_kind"),
        F.lit(PRIORITY["root"]).alias("priority"),
    )
    out = roots.unionByName(won).withColumn("depth", F.lit(None).cast("int"))
    return out.select([c.name for c in JOIN_RESULT_SCHEMA.fields])


def resolve_exact(features: DataFrame, method: str = "batch") -> DataFrame:
    """Reference-parity sequential cascade per doc (operators/kernel.py).

    method='batch' (default): hash-repartition by doc_id +
    sortWithinPartitions (docs contiguous in the Arrow stream) +
    ``mapInPandas`` — one pandas frame per Arrow batch, numpy slice per
    doc. Same shuffle count as the groupBy path but 3-4x less Python
    overhead. method='group': applyInPandas one-frame-per-doc (kept as
    the independently-coded parity check)."""
    from har2tree_spark.operators.kernel import (  # noqa: PLC0415
        KERNEL_COLS,
        cascade_batch,
        cascade_kernel,
    )

    f = live_features(features).select(*KERNEL_COLS)
    if method == "group":
        return f.groupBy("doc_id").applyInPandas(cascade_kernel, JOIN_RESULT_SCHEMA)
    # full ordering done JVM-side (we shuffle anyway, and Tungsten sort is
    # far cheaper than a pandas object-dtype sort per Arrow batch); the
    # kernel trusts the (doc_id, offset, span_idx) stream order.
    # EXPLICIT partition count (4 tasks/core): repartition("doc_id") without
    # a count lets AQE coalesce by shuffle BYTES — but this stage's cost is
    # Python-kernel CPU per row, not bytes, so AQE under-partitions it
    # (measured: 9 tasks on 8 cores = a 2-wave schedule with a one-task
    # second wave, ~40% idle; the whole N-vs-4N scaling gap lived here).
    n_parts = 4 * f.sparkSession.sparkContext.defaultParallelism
    return (
        f.repartition(n_parts, "doc_id")
        .sortWithinPartitions("doc_id", "offset", "span_idx")
        .mapInPandas(cascade_batch, JOIN_RESULT_SCHEMA)
    )
