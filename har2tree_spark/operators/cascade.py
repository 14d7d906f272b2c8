"""The consume-once join cascade (the heart of the engine).

The reference builds its tree with a priority-ordered cascade of hash joins
from parent candidates to unattached entries, where each successful join
consumes the child so weaker joins can't claim it (reference
har2tree.py:879-1014; consumption at :924, :958, :968, :987, :1011).

Two resolution modes:

  * ``resolve_rank`` — fully relational: ONE probe→target equi-join on
    (doc_id, pointer = key) generates the candidate edges of all five
    stages (r8; see candidate_edges), then one ``min_by`` aggregate per
    child (priority, parent offset, parent ordering) picks each child's
    winner with map-side partial combine. Single-pass, SQL-expressible
    (the driver's DuckDB oracle replays the same semantics as its own
    five-branch statement — the restructure is engine-side only, verified
    row/multiset-identical), and the idiomatic at-scale plan: the join is
    keyed by (doc_id, feature-key) so AQE can pick broadcast/skew
    variants. It deliberately relaxes the reference's DFS *visit order*
    to a per-child priority order — the consume-once guarantee (each
    child attached exactly once, strongest claim wins) is preserved.

  * ``resolve_exact`` — reference-parity sequential semantics: the per-doc
    DFS with true consume-once ordering and the spatial fallback cascade,
    run as a vectorized kernel behind ``mapInArrow`` (r8 default; the
    mapInPandas / applyInPandas entries remain as parity paths — docs are
    independent and small, the natural unit of parallelism at 10^12-doc
    scale; there is no cross-doc dataflow, so this parallelizes linearly).
    Matches the pure-Python oracle (oracle/pycascade.py) bit-for-bit.
"""

from __future__ import annotations

import os

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
    stages. Returns columns:
    doc_id, child_idx, parent_idx, join_kind, priority, p_offset, root_idx.

    ONE equi-join on (doc_id, pointer = key) produces all five stages
    (r8 restructure — guide §2.4/§3: the r7 shape ran five separate joins,
    i.e. five exchanges/broadcast builds over the same table). Every stage
    is a "pointer value resolves to a span key" lookup; they differ only in
    which side holds the pointer:

      J2 redirect   parent.media_ref -> child.key   (prefix-to-first-valid)
      J3 frame      iframe parent ref_tokens -> child.key
      J4 initiator  js child.media_ref -> parent.key
      J5 referer    non-js child.media_ref -> parent.key
      J6 resource   html/css/js parent ref_tokens -> child.key (child has
                    no referer of its own)

    So: build one probe table (doc_id, ptr, src span, probe kind) as a
    3-branch narrow union, one target table of key-addressable spans, join
    once, and map (src, hit) to (child, parent) per probe kind.

    The redirect prefix rule is PARENT-INDEPENDENT, which lets it move to
    the target side, before the join: a redirect parent's candidate list is
    all spans with key == p_media ordered by (offset, span_idx), cut at the
    first valid one. The r7 per-parent window also excluded the parent row
    itself (not_self) and parents with p_key == p_media — but a parent with
    p_key == p_media is dropped whole by the eqNullSafe guard, so the
    parent row can never appear in its own surviving candidate list, and
    the per-(doc, key) prefix equals the per-parent prefix exactly. The
    window therefore runs once over the n-row target table instead of over
    the edge fan-out.

    materialize: persist ONE slim projection (drops the text/geometry
    columns; keeps the join scalars + ref_tokens) that the probe/target
    branches fan out from — a single upstream evaluation instead of one per
    branch, without paying to cache the full feature table."""
    f = live_features(features)
    if materialize:
        f = f.select(
            "doc_id", "span_idx", "kind", "media_ref", "offset",
            "key", "valid", "root_idx", "ref_tokens",
        ).persist()

    # target: spans addressable by key. The redirect prefix rule (rn up to
    # and including the first valid hit, per (doc_id, key), ordered by
    # (offset, span_idx)) is a target-side window — see docstring proof.
    w_key = Window.partitionBy("doc_id", "key").orderBy("offset", "span_idx")
    rn = F.row_number().over(w_key)
    first_valid = F.min(F.when(F.col("valid"), rn)).over(
        Window.partitionBy("doc_id", "key")
    )
    tgt = (
        f.filter(F.col("key").isNotNull())
        .select("doc_id", "key", "span_idx", "offset", "valid", "media_ref")
        .withColumn("t_red_ok", rn <= F.coalesce(first_valid, F.lit(_BIG)))
        .select(
            F.col("doc_id").alias("t_doc"),
            F.col("key").alias("t_key"),
            F.col("span_idx").alias("t_idx"),
            F.col("offset").alias("t_offset"),
            (F.col("media_ref") == "").alias("t_no_media"),
            "t_red_ok",
        )
    )
    # Join strategy (r8, guide §3.1): SHUFFLE_HASH building the target side.
    # The target exchange ALREADY exists — the redirect-prefix window hash-
    # partitions tgt by exactly the join key (doc_id, key) — so the shuffled
    # join adds only the probe-side exchange, and the two input shuffles
    # materialize CONCURRENTLY under AQE. The default (auto-broadcast at
    # bench scale) instead serializes three waves: window exchange -> window
    # + driver collect + broadcast build -> probe stage. Measured (sf0.1,
    # interleaved best-of-4, two sessions): resolve_rank 0.95-1.35 s
    # broadcast vs 0.82-1.12 s shuffled-hash, every interleaved pairing in
    # favor; result-identical (strategy hints cannot change join semantics;
    # verified exceptAll-empty both directions). At cluster scale both
    # sides grow with the data, so a broadcast is not on the table anyway;
    # shuffled-hash keeps the window-exchange reuse and skips sort-merge's
    # per-side sorts, the build side is the narrower table, and AQE's
    # skew-join splitting applies to SHJ. Env override for memory-tight
    # clusters where the per-partition hash build is the binding risk
    # ('merge') or to let the planner decide by size ('auto').
    strategy = os.environ.get("SPARK_GRAFT_CASCADE_JOIN", "shuffle_hash")
    if strategy in ("shuffle_hash", "merge", "broadcast"):
        tgt = tgt.hint(strategy)

    # probes: one row per pointer lookup, generated by a SINGLE scan — each
    # span contributes a small array of (ptr, probe) structs (0-1 redirect,
    # 0-1 initiator/referer, 0-k frame/resource tokens) exploded once. The
    # token explode runs ONCE and serves both frame and resource stages.
    def _probe(ptr, kind):
        return F.struct(ptr.alias("ptr"), kind.alias("probe"))

    empty = F.array().cast("array<struct<ptr:string,probe:string>>")
    probe_arr = F.concat(
        F.when(
            (F.col("kind") == "redirect")
            & (F.col("media_ref") != "")
            # NOT (c_key <=> p_key) with c_key == p_media joined: evaluable
            # probe-side as NOT (p_media <=> p_key)
            & ~F.col("media_ref").eqNullSafe(F.col("key")),
            F.array(_probe(F.col("media_ref"), F.lit("redirect"))),
        ).otherwise(empty),
        F.when(
            F.col("kind").isin("iframe", "html", "css", "js"),
            F.transform(
                "ref_tokens",
                lambda t: _probe(
                    t,
                    F.when(F.col("kind") == "iframe", "frame").otherwise(
                        "resource"
                    ),
                ),
            ),
        ).otherwise(empty),
        F.when(
            F.col("media_ref") != "",
            F.array(
                _probe(
                    F.col("media_ref"),
                    F.when(F.col("kind") == "js", "initiator").otherwise(
                        "referer"
                    ),
                )
            ),
        ).otherwise(empty),
    )
    probes = f.select(
        "doc_id",
        F.col("span_idx").alias("src_idx"),
        F.col("offset").alias("src_offset"),
        F.col("root_idx"),
        F.explode(probe_arr).alias("pp"),
    ).select(
        "doc_id", "src_idx", "src_offset", "root_idx",
        F.col("pp.ptr").alias("ptr"), F.col("pp.probe").alias("probe"),
    )

    is_parent_probe = F.col("probe").isin("redirect", "frame", "resource")
    hits = (
        probes.join(
            tgt,
            (F.col("doc_id") == F.col("t_doc")) & (F.col("ptr") == F.col("t_key")),
        )
        .filter(
            (F.col("t_idx") != F.col("src_idx"))  # not_self, all stages
            & ((F.col("probe") != "resource") | F.col("t_no_media"))
            & ((F.col("probe") != "redirect") | F.col("t_red_ok"))
        )
        .select(
            "doc_id",
            F.when(is_parent_probe, F.col("t_idx"))
            .otherwise(F.col("src_idx"))
            .alias("child_idx"),
            F.when(is_parent_probe, F.col("src_idx"))
            .otherwise(F.col("t_idx"))
            .alias("parent_idx"),
            F.col("probe").alias("join_kind"),
            F.when(is_parent_probe, F.col("src_offset"))
            .otherwise(F.col("t_offset"))
            .alias("p_offset"),
            "root_idx",
        )
    )
    edges = hits
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


_EXPENSIVE_PLAN_NODES = (
    "Join", "Aggregate", "Window", "Generate", "Expand", "Sort",
    "MapInPandas", "FlatMapGroupsInPandas", "MapInArrow", "PythonUDF",
    "Union", "Repartition", "CollectMetrics",
)


def _is_cheap_rescan(df: DataFrame) -> bool:
    """True when the frame's optimized plan is only projections/filters
    over leaf scans (checkpoint RDD, file source, local relation) — i.e.
    re-scanning it per branch costs no recomputation of expensive lineage,
    so an extra materialization pass would be pure overhead. Conservative:
    any doubt (or introspection failure) returns False and keeps the
    materialization."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001 - introspection is best-effort
        return False
    return not any(node in plan for node in _EXPENSIVE_PLAN_NODES)


def resolve_rank(
    features: DataFrame, edges: DataFrame | None = None, materialize: bool = True
) -> DataFrame:
    """Single-window consume-once resolution (rank mode). Children with no
    candidate edge fall to 'fallback_root' (the spatial fallback stages are
    applied by operators.fallback on top of this). Returns
    JOIN_RESULT_SCHEMA columns.

    materialize: persist one slim projection of the live features (no text/
    geometry columns) that the candidate probe/target branches AND the
    roots/unmatched branches all fan out from — a single upstream
    evaluation. At cluster scale this is the table the features stage
    writes to storage. Skipped automatically when the input plan is
    already a cheap re-scannable leaf (a checkpoint or file scan under
    only projections/filters): re-checkpointing such an input costs one
    full eager pass and buys nothing, since each branch re-scan is
    exactly as cheap as scanning the new checkpoint (r8 measured: ~0.3 s
    of the bench's q2 was this double materialization)."""
    if materialize and edges is None and not _is_cheap_rescan(features):
        # EAGER localCheckpoint, not persist(): (a) a lazy persist lets the
        # candidate branches of one cold job race to compute the uncached
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
    # winner per child = min by (priority, p_offset, parent_idx) — as ONE
    # hash aggregate (min_by plans as ObjectHashAggregate; a plain
    # min(struct) falls back to SortAggregate) instead of the r7
    # row_number window (guide §2.3 "aggregate before you shuffle"): the
    # aggregate partial-combines map-side (duplicate token-fanout edges
    # and beaten candidates collapse before the exchange) and needs no
    # sort. min_by tie ambiguity is void: within one (doc, child) group
    # the ordering struct determines the payload — (child, priority)
    # determines join_kind (priority<->kind is a bijection) and p_offset
    # is a function of the parent — so equal-ordering rows are bit-equal
    # duplicates (token fan-out) and the pick equals the window's rk==1.
    best = F.min_by(
        F.struct("parent_idx", "join_kind", "priority"),
        F.struct("priority", "p_offset", "parent_idx"),
    ).alias("b")
    won = (
        edges.filter(F.col("child_idx") != F.col("root_idx"))
        .unionByName(fallback)
        .groupBy("doc_id", "child_idx")
        .agg(best)
        .select(
            "doc_id",
            F.col("child_idx").alias("span_idx"),
            F.col("b.parent_idx").alias("parent_idx"),
            F.col("b.join_kind").alias("join_kind"),
            F.col("b.priority").alias("priority"),
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


def resolve_exact(features: DataFrame, method: str = "arrow") -> DataFrame:
    """Reference-parity sequential cascade per doc (operators/kernel.py).

    method='arrow' (default, r8): hash-repartition by doc_id +
    sortWithinPartitions (docs contiguous in the Arrow stream) +
    ``mapInArrow`` — numpy views straight off the Arrow buffers, no
    pandas block-manager round trip (guide §4.2; the conversion was most
    of the kernel stage's Python-side cost). method='batch': the prior
    ``mapInPandas`` entry over the same kernel (kept as the independently
    converted parity path). method='group': applyInPandas
    one-frame-per-doc (the second parity check)."""
    from har2tree_spark.operators.kernel import (  # noqa: PLC0415
        KERNEL_COLS,
        cascade_batch,
        cascade_batch_arrow,
        cascade_kernel,
    )

    f = live_features(features).select(*KERNEL_COLS)
    if method == "group":
        return f.groupBy("doc_id").applyInPandas(cascade_kernel, JOIN_RESULT_SCHEMA)
    # full ordering done JVM-side (we shuffle anyway, and Tungsten sort is
    # far cheaper than a pandas object-dtype sort per Arrow batch); the
    # kernel trusts the (doc_id, offset, span_idx) stream order.
    # EXPLICIT partition count (1 task/core): repartition("doc_id") without
    # a count lets AQE coalesce by shuffle BYTES — but this stage's cost is
    # Python-kernel CPU per row, not bytes, so AQE under-partitions it
    # (measured: 9 tasks on 8 cores = a 2-wave schedule with a one-task
    # second wave, ~40% idle; the whole N-vs-4N scaling gap lived there).
    # One task per core, not 4: each kernel task pays a fixed Arrow-stream +
    # Python-worker round-trip cost, so extra waves multiply overhead
    # without adding parallelism (r8 measured, 20k-doc corpus: 128 tasks on
    # 32 cores 2.56s vs 32 tasks 1.12s — and the gap persists at 10x rows
    # because docs hash-spread evenly, so one wave has no straggler tail).
    # SPARK_GRAFT_KERNEL_WAVES (default 1) scales it back up for clusters
    # where per-partition skew, not per-task overhead, is the binding risk.
    waves = max(1, int(os.environ.get("SPARK_GRAFT_KERNEL_WAVES", "1")))
    n_parts = waves * f.sparkSession.sparkContext.defaultParallelism
    clustered = f.repartition(n_parts, "doc_id").sortWithinPartitions(
        "doc_id", "offset", "span_idx"
    )
    if method == "batch":
        return clustered.mapInPandas(cascade_batch, JOIN_RESULT_SCHEMA)
    return clustered.mapInArrow(cascade_batch_arrow, JOIN_RESULT_SCHEMA)
