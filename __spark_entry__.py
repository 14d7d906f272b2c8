"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (documents -> parse -> exact
consume-once cascade -> tiles -> per-doc stats) on sf0.001.

``queries()`` / ``oracle_sql()`` register each implemented operator from
SURVEY.md §2 as a (Spark DataFrame, DuckDB SQL) pair over the driver's
parquet tables. The interleaved-documents input (BASELINE.json input_hint)
is derived deterministically in-query from `events`
(har2tree_spark/sources/events_spans.py) so both engines see identical data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from har2tree_spark.geo import grid
from har2tree_spark.operators import cascade, parse, stats, tiling
from har2tree_spark.pipeline import run_pipeline
from har2tree_spark.sources import events_spans

_BIG = 2147483647


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full exact-mode pipeline,
    returning per-document golden stats (A4 analogue)."""
    docs = events_spans.documents_from_events(spark, "/root/testdata/sf0.001")
    out = run_pipeline(docs, mode="exact")
    return out["doc_stats"]


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------
_FEATURES_CACHE: dict[tuple[int, str], DataFrame] = {}


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsed features for the events-derived documents, materialized once
    per (session, sf_dir): ~20 gate queries consume this frame in one
    driver process, and re-deriving the events->nest->parse chain per
    query multiplies the gate wall-clock for no coverage gain. Keyed by
    applicationId so a fresh session never sees another session's
    checkpoint blocks."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FEATURES_CACHE:
        # evict entries from dead sessions: dropping the dict entry unpins
        # the Python reference so the checkpointed frame becomes
        # GC-reclaimable (ContextCleaner frees live blocks lazily; a
        # stopped context's blocks are already gone) — eviction itself
        # does not free storage, it stops pinning it forever
        for stale in [k for k in _FEATURES_CACHE if k[0] != key[0]]:
            del _FEATURES_CACHE[stale]
        docs = events_spans.documents_from_events(spark, sf_dir)
        _FEATURES_CACHE[key] = parse.parse_documents(docs).localCheckpoint()
    return _FEATURES_CACHE[key]


def _live(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cascade.live_features(_features(spark, sf_dir))


# --------------------------------------------------------------------------
# Spark queries
# --------------------------------------------------------------------------
def q_geo_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse pass (F1/F2/F13 + P1/P2 analogues): per-span features."""
    return _live(spark, sf_dir).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "kind",
        "key",
        F.col("key_num").cast("long").alias("key_num"),
        F.col("cell").cast("long").alias("cell"),
        F.col("coarse_cell").cast("long").alias("coarse_cell"),
        "valid",
    )


def q_geo_cascade_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consume-once cascade, rank mode (J2-J6 + priority window)."""
    return cascade.resolve_rank(_features(spark, sf_dir)).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("parent_idx").cast("long").alias("parent_idx"),
        "join_kind",
        F.col("priority").cast("long").alias("priority"),
    )


def q_geo_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution tile assignment (A1 hostname-tree analogue)."""
    return tiling.tile_assignment(_features(spark, sf_dir)).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("cell").cast("long").alias("cell"),
        F.col("level").cast("long").alias("level"),
        F.col("parent_cell").cast("long").alias("parent_cell"),
    )


def q_geo_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc aggregates (A4, SQL-checkable subset: no tree recursion)."""
    return (
        _live(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("total_spans"),
            F.count_distinct("key").cast("long").alias("unique_keys"),
            F.count_distinct("cell").cast("long").alias("unique_cells"),
            F.sum(F.length("text")).cast("long").alias("total_len"),
        )
    )


def q_geo_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HostNode rollup analogue (A2/A3) at the coarse resolution."""
    r = stats.cell_rollup(_live(spark, sf_dir), grid.COARSE_RES)
    return r.select(
        "doc_id",
        F.col("cell").cast("long").alias("cell"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_keys").cast("long").alias("n_keys"),
        "has_media",
        "has_text",
        "mixed_content",
    )


def q_geo_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """build_all_hashes analogue (A5): group spans by body digest."""
    return stats.hash_groups(_live(spark, sf_dir)).select(
        "body_hash",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 multi-aggregate shape (TPC-H Q1); decimal-exact sums."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (1 - d("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 deepest-node tiebreak shape: top-3 orders per customer."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("o_custkey").cast("long").alias("o_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def q_cust_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 anti-join shape: customers that never ordered."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select(F.col("c_custkey").cast("long").alias("c_custkey"))
    )


def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 theta/as-of shape: for each purchase, the latest prior view of
    the same user (equi on user + time-range residual + rank)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    j = p.join(v, "u").filter(F.col("vts") < F.col("pts"))
    w = Window.partitionBy("purchase_id").orderBy(F.desc("vts"), F.desc("view_id"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("purchase_id").cast("long").alias("purchase_id"),
            F.col("view_id").cast("long").alias("prior_view_id"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 lag/lead shape: sessionization with 30-minute gaps."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; route via timestamp to epoch seconds (floor)
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    newsess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(newsess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("sess", sess)
        .groupBy("user_id")
        .agg(
            F.count_distinct("sess").cast("long").alias("n_sessions"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(F.col("user_id").cast("long").alias("user_id"), "n_sessions", "n_events")
    )


def q_w1_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/P2 correlated-existence shape on events: error events survive
    only for users with no non-error events."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id")
    good = F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0)).over(w)
    return (
        ev.withColumn("good", good)
        .filter((F.col("event_type") != "error") | (F.col("good") == 0))
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("surviving"))
        .select(F.col("user_id").cast("long").alias("user_id"), "surviving")
    )


def q_hhhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 HHHash analogue: per user, sha256 of the ':'-joined event-type
    sequence with consecutive duplicates collapsed (order-sensitive hash;
    reference helper.py:49-82)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    keep = F.lag("event_type").over(w).isNull() | (
        F.col("event_type") != F.lag("event_type").over(w)
    )
    seq = (
        ev.withColumn("keep", keep)
        .filter("keep")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ":",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("seq")
        )
    )
    return seq.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.concat(F.lit("hhh:1:"), F.sha2(F.col("seq"), 256)).alias("hhhash"),
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs on the documents table."""
    from har2tree_spark.text import dedup  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(d, threshold=0.5).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "est_jaccard"
    )


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs on documents."""
    from har2tree_spark.text import dedup  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(d, threshold=0.5).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard"
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + language-ID heuristic + token counting."""
    from har2tree_spark.text import quality  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality.quality_features(d).select(
        F.col("id").cast("long").alias("id"),
        "n_chars", "n_words", "n_tokens", "mean_word_len",
        "stopword_ratio", "punct_ratio", "digit_ratio",
        "quality_score", "pred_lang",
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized document fingerprint (rolling-hash analogue)."""
    from har2tree_spark.text import quality  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality.fingerprint(d).select(
        F.col("id").cast("long").alias("id"), "fingerprint"
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 20 vectors (score dropped:
    rank is float-noise-stable, raw cosines are not hash-comparable)."""
    from har2tree_spark.ann import knn  # noqa: PLC0415

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    return knn.cosine_topk(e, qs, k=5).select("query_id", "neighbor_id", "rk")


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path). The oracle replays the hyperplane
    signatures exactly: the seeded planes are inlined into the SQL as
    double literals (see _lsh_bucket_sql)."""
    from har2tree_spark.ann import knn  # noqa: PLC0415

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    return knn.lsh_cosine_topk(e, qs, dim=64, k=5).select(
        "query_id", "neighbor_id", "rk"
    )


def q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via hyperplane LSH + exact cosine verify.
    The oracle inlines the seeded hyperplanes as double literals and
    replays bucket-join + verify (no bucket cap: max_bucket is opt-in)."""
    from har2tree_spark.ann import knn  # noqa: PLC0415

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # tau=0.3: the synthetic embeddings are near-orthogonal random vectors
    # (cosine ~ N(0, 1/8)), so a production-style 0.9 returns zero rows —
    # 0.3 keeps the operator's bucket->verify path non-vacuously exercised
    return knn.embedding_neardup_pairs(e, dim=64, tau=0.3).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cosine"
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (second scale path): deterministic sampled quantizer ->
    inverted lists -> nprobe probing -> exact re-rank. Fully
    SQL-replayable (centroids are a SELECT, assignment an argmax
    window)."""
    from har2tree_spark.ann import ivf  # noqa: PLC0415

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20)
    return ivf.ivf_topk(e, qs, k=5, n_centroids=32, nprobe=4).select(
        "query_id", "neighbor_id", "rk"
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs; the oracle replays the 64-bit bit-majority
    fold from md5 hex digits as a bit string."""
    from har2tree_spark.text import dedup  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_pairs(d, max_hamming=8)


def q_geo_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster->vector zonal aggregate: span text tokens rasterized to
    pixel points, aggregated per coarse grid zone."""
    from har2tree_spark.operators import zonal  # noqa: PLC0415

    pix = zonal.rasterize_spans(_live(spark, sf_dir))
    return zonal.zonal_stats_by_cell(pix).select(
        F.col("zone_cell").cast("long").alias("zone_cell"),
        "n_pixels", "n_docs", "n_cells",
    )


def q_geo_cascade_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank cascade + spatial fallback chain (host-cell, ring-kNN, root);
    oracle replays the whole chain relationally (disk join = 81-offset
    cross join)."""
    from har2tree_spark.operators import fallback  # noqa: PLC0415

    feats = _features(spark, sf_dir)
    base = cascade.resolve_rank(feats)
    return fallback.resolve_with_fallbacks(feats, base).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("parent_idx").cast("long").alias("parent_idx"),
        "join_kind",
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads -> Arrow-batched feature
    extraction (stub codec). Payloads are md5-chain-derived so the DuckDB
    oracle replays the bytes, the byte histogram (bin width 16 == high hex
    nibble) and the float32-normalized feature. Arrays are projected to
    scalars (csv / fixed-precision md5) so the driver canonicalizer never
    sees a list value."""
    from har2tree_spark.media import multimodal  # noqa: PLC0415

    m = multimodal.synthesize_media(spark, 256)
    f = multimodal.extract_features(m)
    return f.select(
        "media_id",
        "media_type",
        F.concat_ws(",", F.col("hist").cast("array<string>")).alias("hist_csv"),
        F.md5(
            F.concat_ws(
                ",", F.transform("feature", lambda x: F.format_string("%.6f", x))
            )
        ).alias("feature_md5"),
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (JVM sequence explode over typed
    metadata). Oracle replays duration arithmetic + generate_series and
    the md5-chain payload's sha256."""
    from har2tree_spark.media import multimodal  # noqa: PLC0415

    m = multimodal.synthesize_media(spark, 256)
    return multimodal.sample_frames(m).select(
        "media_id", "doc_id", F.col("frame_ms").cast("long").alias("frame_ms"),
        "source_hex_sha256",
    )


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact blob dedup by payload digest (hash early, ship hashes). The
    corpus is doubled under distinct media_ids so every group is a real
    duplicate group, not a singleton."""
    from har2tree_spark.media import multimodal  # noqa: PLC0415

    m = multimodal.synthesize_media(spark, 256)
    m2 = m.withColumn("media_id", F.concat(F.lit("x"), F.col("media_id")))
    return multimodal.media_dedup(m.unionByName(m2)).select(
        "payload_hex_sha256", F.col("n_blobs").cast("long").alias("n_blobs"), "keeper"
    )


def _tree_documents_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CONFLICT-FREE binary-tree documents from `events`:
    per user, span i gets the doc-unique key k(i+1) and links to parent
    floor((i-1)/2) via a stage cycling by i%3 — resource (css child,
    media '', parent embeds the child key as a text token), referer
    (html child, media = parent key), initiator (js child, media =
    parent key). Every non-root span has exactly ONE candidate edge and
    every span is root-reachable, so the consume-once DFS is
    order-independent on this corpus by construction — the class where
    exact-mode output has a closed relational form (see
    q_cascade_exact_acyclic)."""
    from pyspark.sql import Window  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    i = (F.row_number().over(w) - 1).cast("long")
    n = F.count("*").over(Window.partitionBy("user_id"))
    key = F.concat(F.lit("k"), (i + 1).cast("string"))
    pkey = F.concat(
        F.lit("k"), (F.floor((i - 1) / 2) + 1).cast("long").cast("string")
    )
    m3 = F.pmod(i, F.lit(3))
    kind = (
        F.when(i == 0, "html")
        .when(m3 == 0, "css")
        .when(m3 == 1, "html")
        .otherwise("js")
    )
    media = F.when((i > 0) & m3.isin(1, 2), pkey).otherwise(F.lit(""))
    # the child slots 2i+1 / 2i+2 are resource-kind iff (2i+1)%3==0 (i.e.
    # i%3==1) resp. (2i+2)%3==0 (i%3==2) — mutually exclusive, so each
    # parent embeds at most one resource token
    tok = F.when(
        (m3 == 1) & (2 * i + 1 < n),
        F.concat(F.lit("k"), (2 * i + 2).cast("string")),
    ).when(
        (m3 == 2) & (2 * i + 2 < n),
        F.concat(F.lit("k"), (2 * i + 3).cast("string")),
    )
    flat = ev.select(
        F.concat(F.lit("t"), F.col("user_id").cast("string")).alias("doc_id"),
        i.cast("int").alias("span_idx"),
        kind.alias("kind"),
        F.concat_ws(" ", key, tok).alias("text"),
        media.alias("media_ref"),
        (i * 10).cast("int").alias("offset"),
    )
    return events_spans.nest_spans(flat)


def q_cascade_exact_acyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third independent check on the exact batch kernel (r4 VERDICT #8,
    alongside the pycascade pytest and rank-agreement): on conflict-free,
    fully-root-reachable documents the consume-once DFS is
    order-independent, so its whole tree — join_kind, priority AND
    depth — has a closed relational form a DuckDB recursive CTE can
    replay from the base tables. The corpus is the constructed binary-
    tree derivation (_tree_documents_from_events — that class with 100%
    coverage; the organic events docs all carry conflicts, measured r5),
    but the engine side still runs the REAL pipeline: parse_documents ->
    resolve_exact, with the conflict/fallback guards computed
    relationally on both sides rather than assumed."""
    from har2tree_spark.operators import parse  # noqa: PLC0415

    feats = parse.parse_documents(_tree_documents_from_events(spark, sf_dir))
    # two downstream branches (fallback-doc filter + output) would re-run
    # the mapInPandas kernel subtree per branch — cut the plan eagerly
    exact = cascade.resolve_exact(feats).localCheckpoint()
    edges = cascade.candidate_edges(feats, dedup=True)
    conflicted = (
        edges.filter(F.col("child_idx") != F.col("root_idx"))
        .groupBy("doc_id", "child_idx")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("doc_id")
        .distinct()
    )
    fallback_docs = (
        exact.filter(F.col("join_kind").startswith("fallback"))
        .select("doc_id")
        .distinct()
    )
    return (
        exact.join(conflicted, "doc_id", "left_anti")
        .join(fallback_docs, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("span_idx").cast("long").alias("span_idx"),
            F.col("parent_idx").cast("long").alias("parent_idx"),
            "join_kind",
            F.col("priority").cast("long").alias("priority"),
            F.col("depth").cast("long").alias("depth"),
        )
    )


def q_forest_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forest root resolution by pointer doubling; the oracle replays the
    doubling exactly (10 materialized self-join CTEs — idempotent once
    converged, so the engine's early exit is equivalent)."""
    from har2tree_spark.operators import forest  # noqa: PLC0415

    feats = _features(spark, sf_dir)
    jr = cascade.resolve_rank(feats)
    return forest.forest_join(feats, jr)


def q_resolve_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rebuild_url analogue (F15): mangled refs resolved by candidate
    variants + semi-join against the per-doc key universe."""
    from har2tree_spark.operators import refs  # noqa: PLC0415

    f = _live(spark, sf_dir)
    mangled = (
        F.when(F.pmod(F.col("span_idx"), 4) == 0, F.upper(F.col("media_ref")))
        .when(F.pmod(F.col("span_idx"), 4) == 1, F.concat(F.col("media_ref"), F.lit("#x")))
        .when(
            F.pmod(F.col("span_idx"), 4) == 2,
            F.regexp_replace(F.col("media_ref"), "^k", "k0"),
        )
        .otherwise(F.col("media_ref"))
    )
    f2 = f.withColumn("mref", F.when(F.col("media_ref") != "", mangled).otherwise(""))
    return refs.resolve_refs(f2, ref_col="mref").select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "ref",
        "resolved_ref",
        F.col("variant_rank").cast("long").alias("variant_rank"),
    )


def q_geo_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 compactCells analogue over each doc's fine-cell set (bounded
    bottom-up loop; oracle replays the 4 promotion passes as CTEs)."""
    f = _live(spark, sf_dir).select("doc_id", "cell").distinct()
    return tiling.compact_cells(f, grid.FINE_RES, grid.FINE_RES - 4)


def q_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disk-explode ring-kNN: each span's nearest OTHER span by grid
    distance within ring 4 (oracle: 81-offset relational disk join)."""
    from har2tree_spark.operators.fallback import knn_join  # noqa: PLC0415

    f = _live(spark, sf_dir)
    probes = f.select("doc_id", F.col("span_idx").alias("probe_id"), "cell").filter(
        F.col("cell").isNotNull()
    )
    cands = f.select(
        "doc_id",
        F.col("span_idx").alias("cand_id"),
        "cell",
        F.col("offset").alias("cand_offset"),
    ).filter(F.col("cell").isNotNull())
    # two_phase: probes == the full table here (self-kNN), so the single-pass
    # 81-offset disk would amplify the whole table; phase 1 is 9x and only
    # radius-1 misses widen (result-identical, asserted in pytest)
    out = knn_join(probes, cands, k=1, max_ring=4, exclude_self=True, two_phase=True)
    return out.select(
        "doc_id",
        F.col("probe_id").cast("long"),
        F.col("cand_id").cast("long"),
        F.col("ring").cast("long"),
        F.col("d2").cast("long"),
    )


def q_pages_root_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 pages-root fill (har2tree.py:634-645 analogue): img/js spans lose
    their page cell (the pageref-less entry analogue) and are filled with
    the doc's first page via first-over-window."""
    from har2tree_spark.operators import attrs  # noqa: PLC0415

    f = _features(spark, sf_dir).withColumn(
        "coarse_cell",
        F.when(~F.col("kind").isin("img", "js"), F.col("coarse_cell")),
    )
    return attrs.pages_root_fill(f).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("page_cell").cast("long").alias("page_cell"),
        F.col("page_root_idx").cast("long").alias("page_root_idx"),
    )


def q_resources_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 per-span digest set (nodes.py:651-659 analogue)."""
    from har2tree_spark.operators import attrs  # noqa: PLC0415

    return attrs.resources_hashes(_features(spark, sf_dir)).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "n_hashes",
        "resources_hashes",
    )


def q_marker_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F23/F24 + A2 cookie analogue: per-zone marker set union with
    cross-zone ('third-party') counts."""
    from har2tree_spark.operators import attrs  # noqa: PLC0415

    m = attrs.marker_extract(_features(spark, sf_dir))
    return attrs.marker_rollup(m).select(
        "doc_id",
        F.col("zone_cell").cast("long").alias("zone_cell"),
        "n_markers",
        "n_cross_zone",
        "n_receivers",
    )


def q_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F25 identifiers extract: distinct sorted id tokens per span."""
    from har2tree_spark.operators import attrs  # noqa: PLC0415

    return attrs.identifiers_extract(_features(spark, sf_dir)).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "n_ids",
        "identifiers",
    )


def q_key_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7 key classification + normalization over mangled refs
    (numeric = IP-literal analogue, xn-- = IDNA analogue)."""
    from har2tree_spark.operators import attrs  # noqa: PLC0415

    f = _features(spark, sf_dir)
    m = F.pmod(F.col("span_idx"), 4)
    mangled = (
        F.when(F.col("media_ref") == "", "")
        .when(m == 0, F.substring(F.col("media_ref"), 2, 1 << 20))
        .when(m == 1, F.concat(F.lit("xn--"), F.reverse(F.col("media_ref"))))
        .when(m == 2, F.col("media_ref"))
        .otherwise(F.upper(F.col("media_ref")))
    )
    return attrs.key_class(f.withColumn("mref", mangled), ref_col="mref").select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "ref",
        "ref_class",
        "decoded_ref",
    )


def q_decode_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10/F14 multi-way payload decode dispatch (nodes.py:260-498
    analogue): 16 payload shapes over the 18-kind arm cascade incl. base64
    blind-retry + single-trailing-pad repair, multipart split, json-stream
    reframe, form-urlencoded, garbled-gzip flagging, the ion/dns-wire/
    protobuf blackbox tags (nodes.py:361-433), and the POST-decode size
    rules (nodes.py:486-498)."""
    from har2tree_spark.operators import decode  # noqa: PLC0415

    f = _live(spark, sf_dir)
    m = F.pmod(F.col("span_idx"), 16)
    b64 = F.base64(F.col("text").cast("binary"))
    t1 = F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    t2 = F.split_part(F.col("text"), F.lit(" "), F.lit(2))
    pay = (
        F.when(m == 0, F.concat(F.lit("data:text/plain;base64,"), b64))
        .when(m == 1, b64)
        .when(m == 2, F.regexp_replace(b64, "=+$", ""))
        .when(m == 3, F.hex(F.col("text")))
        .when(m == 4, F.concat(F.lit('{"v":"'), F.col("text"), F.lit('"}')))
        .when(m == 5, F.concat(F.lit("p "), F.col("text")))
        .when(
            m == 6,
            F.concat(
                F.lit('--bnd\ncontent-disposition: form-data; name="f0"\n\n'),
                F.col("text"),
                F.lit('\n--bnd\ncontent-disposition: form-data; name="f1"\n\n'),
                t1,
                F.lit("\n--bnd--"),
            ),
        )
        # form arm: '+'-encoded spaces PLUS %XX escapes from the closed
        # set {%6B -> 'k', %20 -> ' '} so the default full percent-decode
        # is exercised while staying DuckDB-replayable (replace chain —
        # exact because decoded text re-introduces no '%')
        .when(
            m == 7,
            F.concat(
                F.lit("k="),
                F.translate(F.col("text"), " ", "+"),
                F.lit("&pct=%6B"),
                F.substr(t1, F.lit(2)),
                F.lit("%20end"),
            ),
        )
        .when(m == 8, F.concat(F.lit(decode.GZIP_GARBLED_PREFIX), F.col("text")))
        .when(
            m == 9,
            F.concat(F.lit('{"a":"'), t1, F.lit('"}{"b":"'), t2, F.lit('"}')),
        )
        .when(
            m == 10,
            F.concat(F.lit('<r a="'), t1, F.lit('"><v>'), t2, F.lit("</v></r>")),
        )
        # urlsafe base64: '?????' suffix guarantees an aligned '???' 3-byte
        # group, whose encoding 'Pz8/' forces a '/' -> '_' after translation
        .when(
            m == 11,
            F.translate(
                F.base64(F.concat(F.col("text"), F.lit("?????")).cast("binary")),
                "+/",
                "-_",
            ),
        )
        .when(m == 12, F.concat(F.lit("$ion_1_0 "), F.col("text")))
        .when(m == 13, F.concat(F.lit("data:application/dns-message;base64,"), b64))
        .when(m == 14, F.concat(F.lit("data:application/x-protobuf,"), F.col("text")))
        # single-trailing-pad repair: pad text to a 3-byte boundary so its
        # base64 is pad-free, then append one '=' (the 'QUJD=' class)
        .otherwise(
            F.concat(
                F.base64(
                    F.concat(
                        F.col("text"),
                        F.repeat(F.lit("?"), (3 - F.length(F.col("text")) % 3) % 3),
                    ).cast("binary")
                ),
                F.lit("="),
            )
        )
    )
    out = decode.decode_dispatch(f.withColumn("payload", pay))
    return out.select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "decode_kind",
        "decode_ok",
        "decoded",
        "decoded_size",
    )


def q_tree_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 d3-tree JSON export (nodes.py:50-66 analogue) — rows-only (the
    nested per-doc assembly is not SQL-expressible; golden-tested in
    tests/test_export.py). Tree serialized as md5 for comparability."""
    from har2tree_spark.operators import export  # noqa: PLC0415

    feats = _features(spark, sf_dir)
    jr = cascade.resolve_rank(feats)
    t = export.tree_json(jr, feats)
    return t.select(
        "doc_id",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.md5("tree").alias("tree_md5"),
    )


def q_span_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5 timestamp parse + duration math AND F8 case-insensitive header
    lookup, fused into one per-span gate row. (Fused so every registered
    operator stays inside the driver's 50-query evaluation window —
    r3 evaluated only the first 50 and these two fell off the end.)"""
    from har2tree_spark import functions as HF  # noqa: PLC0415
    from har2tree_spark.operators import attrs  # noqa: PLC0415

    t = attrs.span_timings(_features(spark, sf_dir))
    live = _live(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    headers = F.transform(
        w,
        lambda tok, i: F.struct(
            F.concat(F.lit("H"), F.pmod(i, 3).cast("string")).alias("name"),
            tok.alias("value"),
        ),
    )
    hdr = live.select(
        "doc_id",
        "span_idx",
        HF.header_lookup(headers, "h1").alias("h1_value"),
        HF.header_lookup(headers, "H2").alias("h2_value"),
    )
    return t.join(hdr, ["doc_id", "span_idx"]).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "start_ts",
        "start_epoch",
        "duration_s",
        "h1_value",
        "h2_value",
    )


def _with_markup_body(live: DataFrame) -> DataFrame:
    """Markup bodies derived in-query from span text (5 arms by span_idx),
    mirrored exactly by the soup oracles: resource+JS-redirect markup,
    meta refresh to the span's own key, plain markup, unresolvable
    redirect, CSS with url()/@import refs + a srcset/poster attribute."""
    t1 = F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    t2 = F.split_part(F.col("text"), F.lit(" "), F.lit(2))
    m = F.col("span_idx") % 5
    body = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<div><img src="'), t2,
                F.lit("\"><script>location.href='"), t2,
                F.lit("'</script></div>"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="5;url='), t1,
                F.lit('">'),
            ),
        )
        .when(m == 2, F.lit("<span>no markup refs</span>"))
        .when(m == 3, F.lit("<script>location.replace('kZZZ')</script>"))
        .otherwise(
            F.concat(
                F.lit('<style>.x{background:url("'), t1,
                F.lit('")} @import \''), t2,
                F.lit("';</style><video poster=\""), t1,
                F.lit('"></video>'),
            )
        )
    )
    return live.withColumn("body", body)


def q_soup_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/F18/F26 markup parse: tag sequence, domhash (first 32 hex of
    sha256 over '|'-joined lowercased tags), src/href resource surface —
    all regexp_extract_all, JVM-side."""
    from har2tree_spark.operators import soup  # noqa: PLC0415

    live = _live(spark, sf_dir).select("doc_id", "span_idx", "text")
    out = soup.soup_features(_with_markup_body(live))
    return out.select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "domhash",
        F.col("n_tags").cast("long").alias("n_tags"),
        F.col("n_res").cast("long").alias("n_res"),
        F.concat_ws(",", "res_refs").alias("res_csv"),
    )


def q_js_redirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19/F20: JS-redirect + meta-refresh regex over the body, target
    resolved against the doc's key universe (semi-join); unresolved
    targets flagged redirect_to_nothing."""
    from har2tree_spark.operators import soup  # noqa: PLC0415

    live = _live(spark, sf_dir)
    bodies = _with_markup_body(live.select("doc_id", "span_idx", "text"))
    out = soup.js_redirects(bodies, live)
    return out.select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "redirect_url",
        "redirect_kind",
        "redirect_to_nothing",
    )


_STREAM_GATE_SEQ = [0]


def q_stream_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming gate: the documents table consumed as a FILE STREAM
    (micro-batches through the state store, availableNow trigger, memory
    sink), aggregated per doc_id bucket. The oracle is the equivalent
    batch SQL — streaming output == batch output is the exactly-once
    correctness property this gates."""
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    # the file-stream source wants a DIRECTORY; the driver table is one
    # parquet file — expose it through a symlinked temp dir
    d = tempfile.mkdtemp(prefix="stream_gate_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"), f"{d}/part-0.parquet"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = (
        stream.withColumn(
            "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
        )
        .groupBy((F.col("doc_id") % 10).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    _STREAM_GATE_SEQ[0] += 1
    qname = f"stream_gate_{_STREAM_GATE_SEQ[0]}"
    # materialize the memory-sink rows, then tear everything down BEFORE
    # returning: a long-lived driver must not accumulate temp dirs,
    # symlinks or global memory-sink tables across gate invocations
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.table(qname).collect()
    finally:
        import shutil  # noqa: PLC0415

        spark.catalog.dropTempView(qname)
        shutil.rmtree(d, ignore_errors=True)
    out = spark.createDataFrame(rows, "bucket long, n_docs long, total_tokens long")
    return out.select(
        F.col("bucket").cast("long").alias("bucket"), "n_docs", "total_tokens"
    )


def q_tree_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 nested-JSON export, ORACLED variant: the rank join result is
    canonically acyclicized first (an edge survives only if parent_idx <
    span_idx; otherwise the span re-parents to the doc root as
    fallback_root — every chain then strictly descends or terminates at
    the root, so the forest is provably cycle-free), which makes the d3
    tree string SQL-expressible: the oracle rebuilds it with a recursive
    path CTE + DFS-ordered string_agg with bracket-close counts. The
    general cyclic-capable exporter stays gated by q_tree_json
    (rows-only) + the pytest goldens."""
    from har2tree_spark.operators import export  # noqa: PLC0415

    feats = _features(spark, sf_dir)
    jr = cascade.resolve_rank(feats)
    lf = cascade.live_features(feats).select("doc_id", "span_idx", "root_idx")
    jr2 = jr.join(lf, ["doc_id", "span_idx"])
    keep = (F.col("parent_idx") == -1) | (F.col("parent_idx") < F.col("span_idx"))
    acyc = jr2.select(
        "doc_id",
        "span_idx",
        F.when(keep, F.col("parent_idx")).otherwise(F.col("root_idx")).alias(
            "parent_idx"
        ),
        F.when(keep, F.col("join_kind")).otherwise(F.lit("fallback_root")).alias(
            "join_kind"
        ),
    )
    t = export.tree_json(acyc, feats)
    return t.select(
        "doc_id",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.md5("tree").alias("tree_md5"),
    )


def q_tree_cyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 cyclic-capable exporter, ORACLED (r5 VERDICT #2): the REAL
    visited-set island DFS (export.tree_json — the path q_tree_export's
    acyclicization bypasses) run over synthesized per-doc parent pointers
    that contain genuine cycles: per doc (one per events user) a mode by
    user_id%4 — 0: rooted chain (acyclic control); 1: 2-cycle at spans
    {0,1} with the chain hanging off; 2: 3-cycle at {0,1,2}; 3: a rooted
    tree PLUS a separate 2-cycle island at {2,3} (exercises the
    multi-tree '[...]' wrapper).

    Why this is value-exact-checkable: in a consume-once parent map,
    cycles are never reachable from a root (their parent chains loop
    instead of reaching -1), so the exporter reaches them only through
    the island sweep, which starts at the smallest unvisited span. Every
    cycle here contains its component's smallest span BY CONSTRUCTION,
    so the island sweep enters each cyclic component exactly at the
    smallest cycle member and drops only that member's outgoing
    back-edge — i.e. the exporter's output equals "re-root the minimum
    member of every cycle, then serialize the acyclic forest", which the
    DuckDB oracle replays with a path-array-guarded recursive CTE that
    DISCOVERS the cycles (it does not assume their location) followed by
    the same DFS-path string_agg as the tree_export oracle."""
    from pyspark.sql import Window  # noqa: PLC0415

    from har2tree_spark.operators import export  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    i = (F.row_number().over(w) - 1).cast("long")
    n = F.count("*").over(Window.partitionBy("user_id"))
    uid = F.col("user_id").cast("long")
    m = F.pmod(uid, F.lit(4))
    mode = (
        F.when((m == 1) & (n >= 2), 1)
        .when((m == 2) & (n >= 3), 2)
        .when((m == 3) & (n >= 4), 3)
        .otherwise(0)
    )
    chain = F.when(i == 0, -1).otherwise(i - 1)
    parent = (
        F.when(mode == 1, F.when(i == 0, 1).when(i == 1, 0).otherwise(i - 1))
        .when(
            mode == 2,
            F.when(i == 0, 1).when(i == 1, 2).when(i == 2, 0).otherwise(i - 1),
        )
        .when(
            mode == 3,
            F.when(i == 0, -1)
            .when(i == 1, 0)
            .when(i == 2, 3)
            .when(i == 3, 2)
            .otherwise(i - 1),
        )
        .otherwise(chain)
    )
    in_cycle = (
        ((mode == 1) & (i <= 1)) | ((mode == 2) & (i <= 2)) | ((mode == 3) & i.isin(2, 3))
    )
    jk = (
        F.when(parent == -1, "root").when(in_cycle, "redirect").otherwise("referer")
    )
    m4 = F.pmod(i, F.lit(4))
    kind = (
        F.when(m4 == 0, "html").when(m4 == 1, "js").when(m4 == 2, "css").otherwise("img")
    )
    flat = ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("doc_id"),
        i.cast("int").alias("span_idx"),
        parent.cast("int").alias("parent_idx"),
        jk.alias("join_kind"),
        kind.alias("kind"),
        n.cast("int").alias("n_live"),
    )
    jr = flat.select("doc_id", "span_idx", "parent_idx", "join_kind")
    feats = flat.select("doc_id", "span_idx", "kind", "n_live")
    t = export.tree_json(jr, feats)
    return t.select(
        "doc_id",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.md5("tree").alias("tree_md5"),
    )


def q_sidecar_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 sidecar scan: optional per-doc companion columns attach as
    nullable columns via a doc-keyed left join (har2tree.py:105-150
    analogue). Sidecar here: derived stats for even doc_ids only."""
    from har2tree_spark.sources import sidecar  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    side = d.filter(F.pmod(F.col("doc_id"), 2) == 0).select(
        "doc_id",
        F.length("text").cast("long").alias("side_len"),
        F.lit("even").alias("side_tag"),
    )
    out = sidecar.with_sidecar(d.select("doc_id"), side)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "side_len", "side_tag"
    )


def q_ref_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 local-only predicate + F16 url_cleanup drop-rules over mangled
    refs (wrapping quotes, local prefixes, trailing junk)."""
    from har2tree_spark import functions as HF  # noqa: PLC0415

    f = _live(spark, sf_dir)
    m = F.pmod(F.col("span_idx"), 5)
    raw = (
        F.when(m == 0, F.concat(F.lit('"'), F.col("media_ref"), F.lit('"')))
        .when(m == 1, F.concat(F.lit("about:"), F.col("media_ref")))
        .when(m == 2, F.concat(F.col("media_ref"), F.lit(" trailing junk")))
        .when(m == 3, F.concat(F.lit("'"), F.col("media_ref"), F.lit("'")))
        .otherwise(F.col("media_ref"))
    )
    clean, reason = HF.ref_cleanup(raw)
    return f.select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        raw.alias("raw_ref"),
        clean.alias("clean_ref"),
        reason.alias("drop_reason"),
    )


def q_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets aggregate over lineitem (beyond-reference OLAP
    surface; decimal-exact sums)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count("*").cast("long").alias("n"),
        )
    )


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders by status (expressed as conditional aggregation so the
    DuckDB oracle matches column-for-column)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("long")
            .alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("n_finished"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
            .cast("long")
            .alias("n_pending"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via the library operator: documents grouped by content
    digest; members capped at 100 ids (bounded row width at scale — the
    oracle replays the same slice so a cap change diverges loudly)."""
    from har2tree_spark.text import dedup  # noqa: PLC0415

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.exact_dedup(d, members_cap=100)
    return out.select(
        "content_hash",
        "n_docs",
        F.col("keeper").cast("long").alias("keeper_doc_id"),
        F.concat_ws(",", F.col("members").cast("array<string>")).alias(
            "members_csv"
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "geo_features": q_geo_features,
        "geo_cascade_rank": q_geo_cascade_rank,
        "geo_tiles": q_geo_tiles,
        "geo_doc_stats": q_geo_doc_stats,
        "geo_cell_rollup": q_geo_cell_rollup,
        "geo_hash_groups": q_geo_hash_groups,
        # NOTE r4: geo_hot_cells retired from the gate registry (its
        # groupBy+HAVING shape is covered by geo_hash_groups/geo_cell_rollup
        # and its skew-detector role by operators/skew.py + pytest) so that
        # ALL registered queries fit the driver's 50-query evaluation window.
        "geo_cascade_exact": lambda s, d: cascade.resolve_exact(
            _features(s, d)
        ).select(
            "doc_id",
            F.col("span_idx").cast("long").alias("span_idx"),
            F.col("parent_idx").cast("long").alias("parent_idx"),
            "join_kind",
        ),
        "cascade_exact_acyclic": q_cascade_exact_acyclic,
        "tpch_q1": q_tpch_q1,
        "topk_orders": q_topk_orders,
        "cust_no_orders": q_cust_no_orders,
        "asof_purchase_view": q_asof_purchase_view,
        "sessionize": q_sessionize,
        "w1_dedup": q_w1_dedup,
        "hhhash": q_hhhash,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_ngram": q_dedup_ngram,
        "text_quality": q_text_quality,
        "fingerprint": q_fingerprint,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "emb_neardup": q_emb_neardup,
        "simhash_pairs": q_simhash,
        "geo_zonal": q_geo_zonal,
        "geo_cascade_fallback": q_geo_cascade_fallback,
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "media_dedup": q_media_dedup,
        # NOTE r5: forest_edges retired from the gate registry — its output
        # is a pure projection of forest_roots' parent_doc column (same
        # forest_join call; operator still covered by test_forest.py), and
        # the freed slot keeps the registry at the driver's 50-query window
        # with cascade_exact_acyclic added (the kernel's DuckDB check).
        "forest_roots": q_forest_roots,
        "resolve_refs": q_resolve_refs,
        "geo_compact": q_geo_compact,
        "geo_knn": q_geo_knn,
        "cube_stats": q_cube_stats,
        "pivot_status": q_pivot_status,
        "pages_root_fill": q_pages_root_fill,
        "resources_hashes": q_resources_hashes,
        "marker_rollup": q_marker_rollup,
        "identifiers": q_identifiers,
        "key_class": q_key_class,
        "decode_dispatch": q_decode_dispatch,
        # NOTE r6: tree_json (rows-only) retired from the gate registry —
        # its acyclic core is value-exact via tree_export, and its
        # cycle-breaking core is now value-exact via tree_cyclic (the REAL
        # exporter over a constructed cyclic corpus with a DuckDB
        # recursive-CTE cycle-discovery oracle); the organic-cycle path
        # stays pytest-golden-covered (tests/test_export.py). This keeps
        # the registry at the driver's 50-query window and shrinks the
        # no-oracle surface to geo_cascade_exact alone.
        "tree_cyclic": q_tree_cyclic,
        "tree_export": q_tree_export,
        "stream_agg": q_stream_agg,
        "soup_features": q_soup_features,
        "js_redirect": q_js_redirect,
        "sidecar_join": q_sidecar_join,
        "ref_cleanup": q_ref_cleanup,
        "span_attrs": q_span_attrs,
    }


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------
def _geo_cte() -> str:
    return "WITH " + events_spans.SQL_FLAT_SPANS.strip()


_CASCADE_EDGES_SQL = f"""
  redirect_raw AS (
    SELECT p.doc_id, c.span_idx AS child_idx, p.span_idx AS parent_idx,
           p."offset" AS p_offset, c."offset" AS c_offset, c.valid AS c_valid
    FROM live p JOIN live c ON c.doc_id = p.doc_id
    WHERE p.kind = 'redirect' AND p.media_ref <> '' AND c.key = p.media_ref
      AND c.span_idx <> p.span_idx AND c.key <> p.key
  ),
  redirect_rn AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, parent_idx
                                 ORDER BY c_offset, child_idx) AS rn
    FROM redirect_raw
  ),
  redirect_edges AS (
    SELECT doc_id, child_idx, parent_idx, 'redirect' AS join_kind,
           1 AS priority, p_offset
    FROM (SELECT *, MIN(CASE WHEN c_valid THEN rn END)
                     OVER (PARTITION BY doc_id, parent_idx) AS fv
          FROM redirect_rn)
    WHERE rn <= COALESCE(fv, {_BIG})
  ),
  frame_edges AS (
    SELECT DISTINCT p.doc_id, c.span_idx AS child_idx, p.span_idx AS parent_idx,
           'frame' AS join_kind, 2 AS priority, p."offset" AS p_offset
    FROM live p JOIN live c ON c.doc_id = p.doc_id
    WHERE p.kind = 'iframe' AND c.span_idx <> p.span_idx
      AND p.next1 IS NOT NULL AND p.next1 <> p.key AND c.key = p.next1
  ),
  initiator_edges AS (
    SELECT DISTINCT c.doc_id, c.span_idx AS child_idx, p.span_idx AS parent_idx,
           'initiator' AS join_kind, 3 AS priority, p."offset" AS p_offset
    FROM live c JOIN live p ON p.doc_id = c.doc_id
    WHERE c.kind = 'js' AND c.media_ref <> '' AND c.media_ref = p.key
      AND c.span_idx <> p.span_idx
  ),
  referer_edges AS (
    SELECT DISTINCT c.doc_id, c.span_idx AS child_idx, p.span_idx AS parent_idx,
           'referer' AS join_kind, 4 AS priority, p."offset" AS p_offset
    FROM live c JOIN live p ON p.doc_id = c.doc_id
    WHERE c.kind <> 'js' AND c.media_ref <> '' AND c.media_ref = p.key
      AND c.span_idx <> p.span_idx
  ),
  resource_edges AS (
    SELECT DISTINCT p.doc_id, c.span_idx AS child_idx, p.span_idx AS parent_idx,
           'resource' AS join_kind, 5 AS priority, p."offset" AS p_offset
    FROM live p JOIN live c ON c.doc_id = p.doc_id
    -- engine rule: p.kind IN (html,css,js) with tokens from p.text; in this
    -- derivation only html spans embed tokens (next1/next2), so restricting
    -- to html is equivalent
    WHERE p.kind = 'html' AND c.media_ref = ''
      AND c.span_idx <> p.span_idx
      AND ((p.next1 IS NOT NULL AND p.next1 <> p.key AND c.key = p.next1)
        OR (p.next2 IS NOT NULL AND p.next2 <> p.key AND c.key = p.next2))
  ),
  edges AS (
    SELECT * FROM redirect_edges UNION ALL SELECT * FROM frame_edges
    UNION ALL SELECT * FROM initiator_edges UNION ALL SELECT * FROM referer_edges
    UNION ALL SELECT * FROM resource_edges
  ),
  won AS (
    SELECT doc_id, child_idx AS span_idx, parent_idx, join_kind, priority
    FROM (
      SELECT e.*, ROW_NUMBER() OVER (PARTITION BY e.doc_id, e.child_idx
                                     ORDER BY e.priority, e.p_offset, e.parent_idx) AS rk
      FROM edges e JOIN roots r ON r.doc_id = e.doc_id
      WHERE e.child_idx <> r.root_idx
    ) WHERE rk = 1
  ),
  rank_result AS (
    SELECT doc_id, span_idx, parent_idx, join_kind, priority FROM won
    UNION ALL
    SELECT r.doc_id, r.root_idx AS span_idx, -1 AS parent_idx,
           'root' AS join_kind, 0 AS priority
    FROM roots r
    UNION ALL
    SELECT l.doc_id, l.span_idx, r.root_idx AS parent_idx,
           'fallback_root' AS join_kind, 9 AS priority
    FROM live l
    JOIN roots r ON r.doc_id = l.doc_id
    LEFT JOIN won w ON w.doc_id = l.doc_id AND w.span_idx = l.span_idx
    WHERE l.span_idx <> r.root_idx AND w.span_idx IS NULL
  )
"""


def oracle_sql() -> dict[str, str]:
    cte = _geo_cte()
    fine = grid.sql_cell("key_num", grid.FINE_RES)
    coarse = grid.sql_cell("key_num", grid.COARSE_RES)
    out: dict[str, str] = {}

    out["geo_features"] = f"""{cte}
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, kind, key,
             CAST(key_num AS BIGINT) AS key_num,
             {fine} AS cell, {coarse} AS coarse_cell, valid
      FROM live"""

    out["stream_agg"] = r"""
      SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY doc_id % 10"""

    # F17/F18/F26 + F19/F20 soup oracles: markup bodies derived in-query
    # (same 4 arms as _with_markup_body), tags/resources via
    # regexp_extract_all, domhash = first 32 hex of sha256 over the
    # '|'-joined lowercased tag sequence, JS/meta redirect targets
    # resolved against the per-doc key universe
    _soup_bodies = """
      bodies AS (
        SELECT doc_id, span_idx,
               CASE span_idx % 5
                 WHEN 0 THEN '<div><img src="' || t2
                             || '"><script>location.href=''' || t2
                             || '''</script></div>'
                 WHEN 1 THEN '<meta http-equiv="refresh" content="5;url='
                             || t1 || '">'
                 WHEN 2 THEN '<span>no markup refs</span>'
                 WHEN 3 THEN '<script>location.replace(''kZZZ'')</script>'
                 ELSE '<style>.x{background:url("' || t1
                      || '")} @import ''' || t2
                      || ''';</style><video poster="' || t1 || '"></video>'
               END AS body
        FROM (SELECT doc_id, span_idx,
                     split_part(text, ' ', 1) AS t1,
                     split_part(text, ' ', 2) AS t2
              FROM live)
      )"""
    out["soup_features"] = f"""{cte}, {_soup_bodies.strip()},
      tagged AS (
        SELECT doc_id, span_idx,
               list_transform(
                 regexp_extract_all(body, '<([a-zA-Z][a-zA-Z0-9]*)', 1),
                 t -> lower(t)) AS tags,
               regexp_extract_all(body,
                 '\\b(?:src|srcset|longdesc|poster|href|data)="([^"]*)"', 1)
               || regexp_extract_all(body, 'url\\([''"]?([^''")]+)[''"]?\\)', 1)
               || regexp_extract_all(body, '@import\\s+[''"]([^''"]+)[''"]', 1)
                 AS res
        FROM bodies
      )
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             CASE WHEN len(tags) > 0
                  THEN substr(sha256(array_to_string(tags, '|')), 1, 32)
             END AS domhash,
             CAST(len(tags) AS BIGINT) AS n_tags,
             CAST(len(res) AS BIGINT) AS n_res,
             COALESCE(array_to_string(res, ','), '') AS res_csv
      FROM tagged"""

    out["js_redirect"] = f"""{cte}, {_soup_bodies.strip()},
      extracted AS (
        SELECT doc_id, span_idx,
               COALESCE(regexp_extract(body,
                 'location\\.(?:href\\s*=|replace\\(|assign\\()\\s*''([^'']*)''',
                 1), '') AS js,
               COALESCE(regexp_extract(body,
                 'http-equiv="refresh"[^>]*url=([^">]*)', 1), '') AS mt
        FROM bodies
      ),
      cand AS (
        SELECT doc_id, span_idx,
               CASE WHEN js <> '' THEN js WHEN mt <> '' THEN mt END AS target,
               CASE WHEN js <> '' THEN 'js' WHEN mt <> '' THEN 'meta' END
                 AS redirect_kind
        FROM extracted
        WHERE (js <> '' OR mt <> '')
      ),
      uni AS (SELECT DISTINCT doc_id, key FROM live WHERE key IS NOT NULL)
      SELECT c.doc_id, CAST(c.span_idx AS BIGINT) AS span_idx,
             CASE WHEN u.key IS NOT NULL THEN c.target END AS redirect_url,
             c.redirect_kind,
             (u.key IS NULL) AS redirect_to_nothing
      FROM cand c
      LEFT JOIN uni u ON u.doc_id = c.doc_id AND u.key = c.target"""

    # S5 export replay: acyclicized rank forest -> recursive path CTE ->
    # DFS-ordered (path sort) string_agg; each node contributes
    # [comma if a later sibling] + its open-brace text + (depth -
    # next_depth + 1) ']}' closers. Byte-identical to the engine's
    # explicit-stack emitter on acyclic input.
    out["tree_export"] = (f"""{cte}, {_CASCADE_EDGES_SQL.strip()},
      acyc AS (
        SELECT rr.doc_id, rr.span_idx,
               CASE WHEN rr.parent_idx = -1 OR rr.parent_idx < rr.span_idx
                    THEN rr.parent_idx ELSE r.root_idx END AS parent_idx,
               CASE WHEN rr.parent_idx = -1 OR rr.parent_idx < rr.span_idx
                    THEN rr.join_kind ELSE 'fallback_root' END AS join_kind,
               l.kind
        FROM rank_result rr
        JOIN roots r ON r.doc_id = rr.doc_id
        JOIN live l ON l.doc_id = rr.doc_id AND l.span_idx = rr.span_idx
      ),
      rec AS (
        SELECT doc_id, span_idx, [span_idx] AS path
        FROM acyc WHERE parent_idx = -1
        UNION ALL
        SELECT a.doc_id, a.span_idx, list_append(r.path, a.span_idx)
        FROM acyc a JOIN rec r
          ON r.doc_id = a.doc_id AND r.span_idx = a.parent_idx
      ),
      ord AS (
        SELECT r.doc_id, r.span_idx, r.path, len(r.path) - 1 AS depth,
               a.kind, a.join_kind,
               ROW_NUMBER() OVER (PARTITION BY r.doc_id, a.parent_idx
                                  ORDER BY r.span_idx) AS sib_rn
        FROM rec r JOIN acyc a
          ON a.doc_id = r.doc_id AND a.span_idx = r.span_idx
      ),
      ser AS (
        SELECT doc_id, path, depth, sib_rn,
               LEAD(depth, 1, 0) OVER (PARTITION BY doc_id ORDER BY path)
                 AS next_depth,
               '{{"span_idx":' || span_idx || ',"kind":"' || kind
                 || '","join_kind":"' || join_kind || '","children":[' AS opn
        FROM ord
      )
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             md5(string_agg(
               (CASE WHEN sib_rn > 1 THEN ',' ELSE '' END) || opn
                 || repeat(']}}', depth - next_depth + 1),
               '' ORDER BY path)) AS tree_md5
      FROM ser GROUP BY doc_id""").replace("WITH ", "WITH RECURSIVE ", 1)

    # Cyclic exporter replay (see q_tree_cyclic's docstring for the
    # order-independence argument). The walk CTE discovers cycles with a
    # path-array guard; starts are limited to span_idx < 8 — a strict
    # superset of any span a cycle can touch in this corpus (cycles are
    # confined to the component head by construction), which keeps the
    # walk O(n) instead of O(n^2) per doc without assuming WHERE the
    # cycle is within that head.
    out["tree_cyclic"] = """WITH RECURSIVE
      cbase AS (
        SELECT 'c' || CAST(user_id AS VARCHAR) AS doc_id,
               CAST(user_id AS BIGINT) AS uid,
               CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS i,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      cmode AS (
        SELECT *, CASE WHEN uid % 4 = 1 AND n >= 2 THEN 1
                       WHEN uid % 4 = 2 AND n >= 3 THEN 2
                       WHEN uid % 4 = 3 AND n >= 4 THEN 3
                       ELSE 0 END AS mode
        FROM cbase
      ),
      cparents AS (
        SELECT doc_id, i AS span_idx,
               CASE WHEN mode = 1 THEN
                      CASE WHEN i = 0 THEN 1 WHEN i = 1 THEN 0 ELSE i - 1 END
                    WHEN mode = 2 THEN
                      CASE WHEN i = 0 THEN 1 WHEN i = 1 THEN 2
                           WHEN i = 2 THEN 0 ELSE i - 1 END
                    WHEN mode = 3 THEN
                      CASE WHEN i = 0 THEN -1 WHEN i = 1 THEN 0
                           WHEN i = 2 THEN 3 WHEN i = 3 THEN 2 ELSE i - 1 END
                    ELSE CASE WHEN i = 0 THEN -1 ELSE i - 1 END
               END AS parent_idx,
               CASE WHEN (mode = 1 AND i <= 1) OR (mode = 2 AND i <= 2)
                      OR (mode = 3 AND i IN (2, 3)) THEN TRUE
                    ELSE FALSE END AS in_cycle,
               CASE WHEN i % 4 = 0 THEN 'html' WHEN i % 4 = 1 THEN 'js'
                    WHEN i % 4 = 2 THEN 'css' ELSE 'img' END AS kind
        FROM cmode
      ),
      cp AS (
        SELECT doc_id, span_idx, parent_idx, kind,
               CASE WHEN parent_idx = -1 THEN 'root'
                    WHEN in_cycle THEN 'redirect'
                    ELSE 'referer' END AS join_kind
        FROM cparents
      ),
      walk AS (
        SELECT doc_id, parent_idx AS nxt, [span_idx] AS path
        FROM cp WHERE span_idx < 8
        UNION ALL
        SELECT w.doc_id, p.parent_idx, list_append(w.path, p.span_idx)
        FROM walk w JOIN cp p
          ON p.doc_id = w.doc_id AND p.span_idx = w.nxt
        WHERE w.nxt >= 0 AND NOT list_contains(w.path, w.nxt)
      ),
      reroots AS (
        SELECT DISTINCT doc_id,
               list_min(path[list_position(path, nxt):]) AS span_idx
        FROM walk WHERE nxt >= 0 AND list_contains(path, nxt)
      ),
      cp2 AS (
        SELECT c.doc_id, c.span_idx,
               CASE WHEN r.span_idx IS NOT NULL THEN -1
                    ELSE c.parent_idx END AS parent_idx,
               c.join_kind, c.kind
        FROM cp c LEFT JOIN reroots r
          ON r.doc_id = c.doc_id AND r.span_idx = c.span_idx
      ),
      crec AS (
        SELECT doc_id, span_idx, [span_idx] AS path
        FROM cp2 WHERE parent_idx = -1
        UNION ALL
        SELECT a.doc_id, a.span_idx, list_append(r.path, a.span_idx)
        FROM cp2 a JOIN crec r
          ON r.doc_id = a.doc_id AND r.span_idx = a.parent_idx
      ),
      cord AS (
        SELECT r.doc_id, r.span_idx, r.path, len(r.path) - 1 AS depth,
               a.kind, a.join_kind,
               ROW_NUMBER() OVER (PARTITION BY r.doc_id, a.parent_idx
                                  ORDER BY r.span_idx) AS sib_rn
        FROM crec r JOIN cp2 a
          ON a.doc_id = r.doc_id AND a.span_idx = r.span_idx
      ),
      cser AS (
        SELECT doc_id, path, depth, sib_rn,
               LEAD(depth, 1, 0) OVER (PARTITION BY doc_id ORDER BY path)
                 AS next_depth,
               '{"span_idx":' || span_idx || ',"kind":"' || kind
                 || '","join_kind":"' || join_kind || '","children":[' AS opn
        FROM cord
      ),
      cagg AS (
        SELECT doc_id, COUNT(*) AS n_nodes,
               COUNT(CASE WHEN depth = 0 THEN 1 END) AS n_roots,
               string_agg(
                 (CASE WHEN sib_rn > 1 THEN ',' ELSE '' END) || opn
                   || repeat(']}', depth - next_depth + 1),
                 '' ORDER BY path) AS body
        FROM cser GROUP BY doc_id
      )
      SELECT doc_id, CAST(n_nodes AS BIGINT) AS n_nodes,
             md5(CASE WHEN n_roots > 1 THEN '[' || body || ']'
                      ELSE body END) AS tree_md5
      FROM cagg"""

    out["geo_cascade_rank"] = f"""{cte}, {_CASCADE_EDGES_SQL.strip()}
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             CAST(parent_idx AS BIGINT) AS parent_idx, join_kind,
             CAST(priority AS BIGINT) AS priority
      FROM rank_result"""

    # The exact kernel's DuckDB check (r4 VERDICT #8): on the constructed
    # conflict-free binary-tree corpus (see _tree_documents_from_events)
    # the consume-once DFS is order-independent, so a recursive CTE over
    # the candidate edges replays the kernel's exact tree — join_kind,
    # priority AND depth — from the base events table. The conflict and
    # full-reachability guards are recomputed relationally here too, so a
    # construction bug shows up as a row-set mismatch, not a silent skip.
    # redirect/frame candidate arms are structurally empty on this corpus
    # (no redirect/iframe kinds are constructed); the engine side runs
    # all five arms regardless.
    out["cascade_exact_acyclic"] = """WITH RECURSIVE
      tbase AS (
        SELECT 't' || CAST(user_id AS VARCHAR) AS doc_id,
               CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS i,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      tspans AS (
        SELECT doc_id, i AS span_idx,
               CASE WHEN i = 0 THEN 'html'
                    WHEN i % 3 = 0 THEN 'css'
                    WHEN i % 3 = 1 THEN 'html' ELSE 'js' END AS kind,
               'k' || CAST(i + 1 AS VARCHAR) AS key,
               CASE WHEN i > 0 AND i % 3 IN (1, 2)
                    THEN 'k' || CAST(CAST(FLOOR((i - 1) / 2) AS BIGINT) + 1
                                     AS VARCHAR)
                    ELSE '' END AS media_ref,
               CASE WHEN i % 3 = 1 AND 2 * i + 1 < n
                      THEN 'k' || CAST(2 * i + 2 AS VARCHAR)
                    WHEN i % 3 = 2 AND 2 * i + 2 < n
                      THEN 'k' || CAST(2 * i + 3 AS VARCHAR) END AS tok
        FROM tbase
      ),
      tedges AS (
        SELECT c.doc_id, c.span_idx AS child_idx, p.span_idx AS parent_idx,
               'initiator' AS join_kind, 3 AS priority
        FROM tspans c JOIN tspans p
          ON p.doc_id = c.doc_id AND c.media_ref = p.key
        WHERE c.kind = 'js' AND c.media_ref <> '' AND c.span_idx <> p.span_idx
        UNION ALL
        SELECT c.doc_id, c.span_idx, p.span_idx, 'referer', 4
        FROM tspans c JOIN tspans p
          ON p.doc_id = c.doc_id AND c.media_ref = p.key
        WHERE c.kind <> 'js' AND c.media_ref <> '' AND c.span_idx <> p.span_idx
        UNION ALL
        SELECT p.doc_id, c.span_idx, p.span_idx, 'resource', 5
        FROM tspans p JOIN tspans c ON c.doc_id = p.doc_id AND c.key = p.tok
        WHERE p.kind IN ('html', 'css', 'js') AND c.media_ref = ''
          AND c.span_idx <> p.span_idx AND p.tok IS NOT NULL AND p.tok <> p.key
      ),
      e1 AS (
        -- the doc root is span 0 (minimal offset by construction)
        SELECT DISTINCT doc_id, child_idx, parent_idx, join_kind, priority
        FROM tedges WHERE child_idx <> 0
      ),
      conflicted AS (
        SELECT DISTINCT doc_id FROM e1
        GROUP BY doc_id, child_idx HAVING COUNT(*) > 1
      ),
      reach AS (
        SELECT doc_id, CAST(0 AS BIGINT) AS span_idx, -1 AS parent_idx,
               'root' AS join_kind, 0 AS priority, 0 AS depth
        FROM tspans WHERE span_idx = 0
          AND doc_id NOT IN (SELECT doc_id FROM conflicted)
        UNION ALL
        SELECT e.doc_id, e.child_idx, e.parent_idx, e.join_kind,
               e.priority, t.depth + 1
        FROM reach t
        JOIN e1 e ON e.doc_id = t.doc_id AND e.parent_idx = t.span_idx
      ),
      live_counts AS (SELECT doc_id, COUNT(*) AS n_live FROM tspans GROUP BY doc_id),
      reach_counts AS (SELECT doc_id, COUNT(*) AS n_reach FROM reach GROUP BY doc_id),
      full_docs AS (
        SELECT rc.doc_id FROM reach_counts rc
        JOIN live_counts lc ON lc.doc_id = rc.doc_id
        WHERE rc.n_reach = lc.n_live
      )
      SELECT r.doc_id, CAST(r.span_idx AS BIGINT) AS span_idx,
             CAST(r.parent_idx AS BIGINT) AS parent_idx, r.join_kind,
             CAST(r.priority AS BIGINT) AS priority,
             CAST(r.depth AS BIGINT) AS depth
      FROM reach r JOIN full_docs f ON f.doc_id = r.doc_id"""

    lvl_selects = []
    prev = None
    for lvl in grid.TILE_LEVELS:
        cur = grid.sql_cell("key_num", lvl)
        parent = grid.sql_cell("key_num", prev) if prev is not None else "CAST(NULL AS BIGINT)"
        lvl_selects.append(
            f"SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, {cur} AS cell, "
            f"CAST({lvl} AS BIGINT) AS level, {parent} AS parent_cell FROM live"
        )
        prev = lvl
    out["geo_tiles"] = f"{cte} " + " UNION ALL ".join(lvl_selects)

    out["geo_doc_stats"] = f"""{cte}
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total_spans,
             CAST(COUNT(DISTINCT key) AS BIGINT) AS unique_keys,
             CAST(COUNT(DISTINCT {fine}) AS BIGINT) AS unique_cells,
             CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len
      FROM live GROUP BY doc_id"""

    out["geo_cell_rollup"] = f"""{cte}
      SELECT doc_id, {coarse} AS cell,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
             MAX(kind IN ('img','video','audio')) AS has_media,
             MAX(kind IN ('text','html','css','js')) AS has_text,
             (MAX(kind IN ('img','video','audio')) AND
              MAX(kind IN ('text','html','css','js'))) AS mixed_content
      FROM live GROUP BY doc_id, {coarse}"""

    out["geo_hash_groups"] = f"""{cte}
      SELECT sha256(text) AS body_hash,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM live WHERE text <> '' GROUP BY sha256(text)"""

    out["tpch_q1"] = """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""

    out["topk_orders"] = """
      SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
             CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(rk AS BIGINT) AS rk
      FROM (SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders)
      WHERE rk <= 3"""

    out["cust_no_orders"] = """
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""

    out["asof_purchase_view"] = """
      SELECT CAST(purchase_id AS BIGINT) AS purchase_id,
             CAST(view_id AS BIGINT) AS prior_view_id
      FROM (
        SELECT p.event_id AS purchase_id, v.event_id AS view_id,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rk
        FROM events p JOIN events v
          ON v.user_id = p.user_id AND v.ts < p.ts
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
      ) WHERE rk = 1"""

    out["sessionize"] = """
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(COUNT(DISTINCT sess) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM (
        SELECT user_id,
               SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess
        FROM (SELECT user_id, ts, event_id,
                     CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM events)
      ) GROUP BY user_id"""

    out["w1_dedup"] = """
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(COUNT(*) AS BIGINT) AS surviving
      FROM (
        SELECT e.*, SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id) AS good
        FROM events e
      ) WHERE event_type <> 'error' OR good = 0
      GROUP BY user_id"""

    out["hhhash"] = """
      SELECT CAST(user_id AS BIGINT) AS user_id,
             'hhh:1:' || sha256(string_agg(event_type, ':' ORDER BY ts, event_id)) AS hhhash
      FROM (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
      ) WHERE prev IS NULL OR event_type <> prev
      GROUP BY user_id"""

    out["dedup_exact"] = """
      SELECT md5(text) AS content_hash,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
             array_to_string((list_sort(list(doc_id)))[1:100], ',')
               AS members_csv
      FROM documents GROUP BY md5(text)"""

    # shingle CTE shared by the two text-dedup oracles (3-word shingles,
    # identical to har2tree_spark.text.dedup.word_shingles)
    shingle_cte = r"""
      words AS (SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
                FROM documents),
      shingled AS (
        SELECT id,
               CASE WHEN len(w) >= 3
                 THEN list_distinct(list_transform(range(0, len(w) - 2),
                        i -> array_to_string(w[i+1:i+3], ' ')))
                 ELSE [array_to_string(w, ' ')] END AS sh
        FROM words
      )"""

    # replay the universal-hash minhash family: one md5 per shingle
    # (48-bit base from the first 12 hex chars), then min((a*h+b) mod 2^48)
    # per seed with the engine's exact (a, b) literals
    from har2tree_spark.text.dedup import MINHASH_MOD, _mh_params  # noqa: PLC0415

    shingle_cte += r""",
      hashed AS (
        SELECT id, list_transform(sh,
                 s -> CAST('0x' || substr(md5(s), 1, 12) AS BIGINT)) AS hv
        FROM shingled
      )"""
    sig_exprs = ", ".join(
        f"list_aggregate(list_transform(hv, v -> (v * {a} + {b}) % {MINHASH_MOD}),"
        f" 'min')"
        for a, b in _mh_params(16)
    )
    band_exprs = ", ".join(
        "md5(sig[{a}] || '|' || sig[{b}] || '|' || sig[{c}] || '|' || sig[{d}])".format(
            a=4 * b + 1, b=4 * b + 2, c=4 * b + 3, d=4 * b + 4
        )
        for b in range(4)
    )
    out["dedup_minhash"] = f"""WITH {shingle_cte},
      sigs AS (SELECT id, [{sig_exprs}] AS sig FROM hashed),
      banded AS (
        SELECT id, sig, b.band, bhs[b.band + 1] AS bh
        FROM (SELECT id, sig, [{band_exprs}] AS bhs FROM sigs),
             (SELECT unnest(range(0, 4)) AS band) b
      ),
      ok_buckets AS (SELECT band, bh FROM banded GROUP BY band, bh
                     HAVING COUNT(*) <= 64),
      bk AS (SELECT banded.* FROM banded JOIN ok_buckets USING (band, bh)),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               ANY_VALUE(a.sig) AS sig_a, ANY_VALUE(b.sig) AS sig_b
        FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
        GROUP BY a.id, b.id
      )
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             ROUND(list_sum(list_transform(range(1, 17),
                     i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) / 16.0,
                   6) AS est_jaccard
      FROM pairs
      WHERE list_sum(list_transform(range(1, 17),
              i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.5"""

    # the frequency cap (max_df=1000 in ngram_jaccard_pairs) is replayed
    # here so the oracle diverges loudly, not silently, if the engine's
    # capped shingle space ever changes
    out["dedup_ngram"] = f"""WITH {shingle_cte},
      ex0 AS (SELECT DISTINCT id, unnest(sh) AS s FROM shingled),
      freq AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) <= 1000),
      ex AS (SELECT ex0.id, ex0.s FROM ex0 JOIN freq USING (s)),
      sizes AS (SELECT id, COUNT(*) AS sz FROM ex GROUP BY id),
      inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
        FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id
        GROUP BY a.id, b.id
      )
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             ROUND(i / (sa.sz + sb.sz - i), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE i / (sa.sz + sb.sz - i) >= 0.5"""

    sw = {
        lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
        for lang, words in __import__("har2tree_spark.text.quality", fromlist=["STOPWORDS"]).STOPWORDS.items()
    }
    tok_re = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    out["text_quality"] = rf"""
      WITH base AS (
        SELECT doc_id AS id, text, string_split_regex(trim(text), '\s+') AS w
        FROM documents
      ),
      m AS (
        SELECT id, text, w,
               GREATEST(len(w), 1) AS n_words_c,
               GREATEST(length(text), 1) AS n_chars_c,
               list_sum(list_transform(w, x -> length(x))) * 1.0 / GREATEST(len(w), 1) AS mean_wlen,
               len(list_filter(w, x -> list_contains({sw['en']}, lower(x)))) / GREATEST(len(w), 1) AS sw_en,
               len(regexp_extract_all(text, '[^\w\s]')) / GREATEST(length(text), 1) AS punct,
               len(regexp_extract_all(text, '[0-9]')) / GREATEST(length(text), 1) AS digitr
        FROM base
      ),
      langs AS (
        SELECT id,
               list_aggregate([
                 {{'score': len(list_filter(w, x -> list_contains({sw['de']}, lower(x)))) / GREATEST(len(w),1), 'lang': 'de'}},
                 {{'score': len(list_filter(w, x -> list_contains({sw['en']}, lower(x)))) / GREATEST(len(w),1), 'lang': 'en'}},
                 {{'score': len(list_filter(w, x -> list_contains({sw['es']}, lower(x)))) / GREATEST(len(w),1), 'lang': 'es'}},
                 {{'score': len(list_filter(w, x -> list_contains({sw['fr']}, lower(x)))) / GREATEST(len(w),1), 'lang': 'fr'}}
               ], 'max') AS best
        FROM base
      )
      SELECT CAST(m.id AS BIGINT) AS id,
             CAST(length(m.text) AS BIGINT) AS n_chars,
             CAST(len(m.w) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(m.text, '{tok_re}')) AS BIGINT) AS n_tokens,
             ROUND(m.mean_wlen, 6) AS mean_word_len,
             ROUND(m.sw_en, 6) AS stopword_ratio,
             ROUND(m.punct, 6) AS punct_ratio,
             ROUND(m.digitr, 6) AS digit_ratio,
             ROUND(LEAST(len(m.w) / 100.0, 1.0) * 0.25
                   + CASE WHEN m.mean_wlen >= 3 AND m.mean_wlen <= 10 THEN 0.25 ELSE 0.0 END
                   + LEAST(m.sw_en * 5.0, 1.0) * 0.25
                   + GREATEST(0.0, 1.0 - m.punct * 5 - m.digitr * 2) * 0.25, 6) AS quality_score,
             CASE WHEN langs.best['score'] > 0 THEN langs.best['lang'] ELSE 'und' END AS pred_lang
      FROM m JOIN langs ON langs.id = m.id"""

    out["fingerprint"] = r"""
      SELECT CAST(doc_id AS BIGINT) AS id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                     '\s+', ' ', 'g'))) AS fingerprint
      FROM documents"""

    # ---- LSH oracles: replay the seeded hyperplane signatures in SQL ----
    # The planes are deterministic (np.random.default_rng(SeedSequence))
    # so they can be inlined as double literals; the bucket is then pure
    # arithmetic DuckDB can evaluate. Sign parity between numpy's matmul
    # and DuckDB's sequential list_dot_product holds because |v.P| for
    # random normal data is O(1) — astronomically far from the 1e-12
    # reassociation error band.
    def _lsh_bucket_sql(vec: str, dim: int, bits: int, table: int) -> str:
        from har2tree_spark.ann.knn import _planes  # noqa: PLC0415

        planes = _planes(dim, bits, table)
        terms = []
        for b in range(bits):
            lits = ", ".join(repr(float(x)) for x in planes[:, b])
            terms.append(
                f"(CASE WHEN list_dot_product({vec}, [{lits}]) > 0"
                f" THEN {1 << b} ELSE 0 END)"
            )
        return "(" + "\n               + ".join(terms) + ")"

    def _bucket_cols(vec: str, dim: int = 64, bits: int = 10, tables: int = 4) -> str:
        return ",\n               ".join(
            f"{_lsh_bucket_sql(vec, dim, bits, t)} AS b{t}" for t in range(tables)
        )

    _bucket_eq = " OR ".join(f"a.b{t} = x.b{t}" for t in range(4))
    out["ann_lsh"] = f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS MATERIALIZED (
        SELECT vec_id, v,
               {_bucket_cols("v")}
        FROM e
      ),
      cand AS (
        SELECT x.vec_id AS query_id, a.vec_id AS neighbor_id,
               x.v AS qv, a.v AS cv
        FROM b a JOIN (SELECT * FROM b WHERE vec_id < 20) x
          ON ({_bucket_eq})
        WHERE a.vec_id <> x.vec_id
      ),
      s AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS score
        FROM cand
      )
      SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(neighbor_id AS BIGINT) AS neighbor_id,
             CAST(rk AS BIGINT) AS rk
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rk
            FROM s)
      WHERE rk <= 5"""

    out["emb_neardup"] = f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS MATERIALIZED (
        SELECT vec_id, v,
               {_bucket_cols("v")}
        FROM e
      ),
      cand AS (
        SELECT a.vec_id AS id_a, x.vec_id AS id_b, a.v AS va, x.v AS vb
        FROM b a JOIN b x
          ON a.vec_id < x.vec_id AND ({_bucket_eq})
      ),
      s AS (
        SELECT id_a, id_b,
               list_dot_product(va, vb)
                 / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) AS c
        FROM cand
      )
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             ROUND(c, 6) AS cosine
      FROM s WHERE c >= 0.3"""

    # ---- media_features oracle: replay the md5-chain payload in SQL ----
    # payload hex = md5('42:i:0') || md5('42:i:1') || ... truncated to
    # 2*size chars; byte-histogram bin (width 16) == the byte's high hex
    # nibble, so counts are pure string ops. float32 normalization parity:
    # counts and sum-of-squares are < 2^24 (exact in float32), and
    # sqrt/divide through double then cast-to-float is correctly rounded
    # (2p+2 theorem), so CAST(... AS FLOAT) reproduces numpy bit-for-bit.
    _hexd = "0123456789abcdef"
    _chain = " || ".join(f"md5('42:' || i || ':{j}')" for j in range(16))
    _cnts = ",\n               ".join(
        f"length(hn) - length(replace(hn, '{d}', '')) AS c{b}"
        for b, d in enumerate(_hexd)
    )
    _ss = " + ".join(f"c{b}*c{b}" for b in range(16))
    _featcat = " || ',' || ".join(
        f"printf('%.6f', CAST(CAST(c{b} AS FLOAT) / nrm AS FLOAT))"
        for b in range(16)
    )
    _histcat = " || ',' || ".join(f"CAST(c{b} AS VARCHAR)" for b in range(16))
    out["media_features"] = f"""
      WITH ids AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, 256)),
      hx AS (
        SELECT i, substr({_chain}, 1, 2 * (64 + i % 192)) AS h FROM ids
      ),
      hh AS (SELECT i, regexp_replace(h, '(.).', '\\1', 'g') AS hn FROM hx),
      c AS (SELECT i,
               {_cnts}
            FROM hh),
      nn AS (SELECT *, CAST(sqrt(CAST({_ss} AS FLOAT)) AS FLOAT) AS nrm FROM c)
      SELECT printf('m%08d', i) AS media_id,
             CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
             {_histcat} AS hist_csv,
             md5({_featcat}) AS feature_md5
      FROM nn"""

    out["media_frames"] = f"""
      WITH ids AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, 256)),
      v AS (
        SELECT i, 1000 * (i % 30) AS dur,
               substr({_chain}, 1, 2 * (64 + i % 192)) AS h
        FROM ids WHERE i % 3 = 2
      )
      SELECT printf('m%08d', i) AS media_id,
             'doc-' || printf('%08d', i % 64) AS doc_id,
             CAST(unnest(generate_series(0, greatest(dur - 1, 0), 5000)) AS BIGINT)
               AS frame_ms,
             sha256(h) AS source_hex_sha256
      FROM v"""

    # every md5-chain payload is distinct, so the doubled corpus groups
    # exactly into {{m<i>, xm<i>}} pairs: n_blobs=2, keeper='m%08d'
    out["media_dedup"] = f"""
      WITH ids AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, 256))
      SELECT sha256(substr({_chain}, 1, 2 * (64 + i % 192)))
               AS payload_hex_sha256,
             CAST(2 AS BIGINT) AS n_blobs,
             printf('m%08d', i) AS keeper
      FROM ids"""

    _cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    out["ann_ivf"] = f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cents AS MATERIALIZED (
        SELECT vec_id AS centroid_id, v AS cv FROM e ORDER BY vec_id LIMIT 32
      ),
      lists AS (
        SELECT neighbor_id, nv, centroid_id FROM (
          SELECT e.vec_id AS neighbor_id, e.v AS nv, c.centroid_id,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_cos.format(a='e.v', b='c.cv')} DESC,
                            c.centroid_id) AS crk
          FROM e, cents c
        ) WHERE crk <= 1
      ),
      probes AS (
        SELECT query_id, qv, centroid_id FROM (
          SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_cos.format(a='e.v', b='c.cv')} DESC,
                            c.centroid_id) AS crk
          FROM e, cents c WHERE e.vec_id < 20
        ) WHERE crk <= 4
      ),
      cand AS (
        SELECT p.query_id, l.neighbor_id,
               ANY_VALUE(p.qv) AS qv, ANY_VALUE(l.nv) AS nv
        FROM lists l JOIN probes p USING (centroid_id)
        WHERE p.query_id <> l.neighbor_id
        GROUP BY p.query_id, l.neighbor_id
      )
      SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(neighbor_id AS BIGINT) AS neighbor_id,
             CAST(rk AS BIGINT) AS rk
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY {_cos.format(a='qv', b='nv')} DESC,
                              neighbor_id) AS rk
            FROM cand)
      WHERE rk <= 5"""

    out["ann_topk"] = """
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 20),
      c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      s AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS score
        FROM q, c WHERE query_id <> neighbor_id
      )
      SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(neighbor_id AS BIGINT) AS neighbor_id,
             CAST(rk AS BIGINT) AS rk
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rk
            FROM s)
      WHERE rk <= 5"""

    # forest_edges is no longer a registered gate query (r5: subsumed by
    # forest_roots' parent_doc column) but its SQL remains the core the
    # forest_roots oracle is assembled from
    forest_edges_sql = f"""{cte}, {_CASCADE_EDGES_SQL.strip()},
      root_rows AS (
        SELECT r.doc_id, r.root_idx, l.key AS root_key, l.media_ref AS root_ref
        FROM roots r JOIN live l ON l.doc_id = r.doc_id AND l.span_idx = r.root_idx
      ),
      landing AS (
        SELECT rr.doc_id,
               COALESCE(lk.key, rr.root_key) AS landing_key
        FROM root_rows rr
        LEFT JOIN (
          SELECT doc_id, span_idx FROM (
            SELECT doc_id, span_idx,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY span_idx DESC) AS rn
            FROM rank_result WHERE join_kind = 'redirect'
          ) WHERE rn = 1
        ) ch ON ch.doc_id = rr.doc_id
        LEFT JOIN live lk ON lk.doc_id = ch.doc_id AND lk.span_idx = ch.span_idx
      )
      SELECT child_doc, parent_doc FROM (
        SELECT c.doc_id AS child_doc, p.doc_id AS parent_doc,
               ROW_NUMBER() OVER (PARTITION BY c.doc_id ORDER BY p.doc_id) AS rk
        FROM root_rows c
        JOIN landing p ON p.landing_key = c.root_ref AND p.doc_id <> c.doc_id
        WHERE c.root_ref <> ''
      ) WHERE rk = 1"""

    out["resolve_refs"] = f"""{cte},
      mangled AS (
        SELECT doc_id, span_idx, key,
               CASE WHEN media_ref = '' THEN ''
                    WHEN span_idx % 4 = 0 THEN UPPER(media_ref)
                    WHEN span_idx % 4 = 1 THEN media_ref || '#x'
                    WHEN span_idx % 4 = 2 THEN regexp_replace(media_ref, '^k', 'k0')
                    ELSE media_ref END AS mref
        FROM live
      ),
      probes AS (
        SELECT doc_id, span_idx, mref AS ref, v.variant_rank, v.variant
        FROM mangled,
        LATERAL (
          SELECT * FROM (VALUES
            (0, mref),
            (1, CASE WHEN instr(mref, '#') > 0
                     THEN substr(mref, 1, instr(mref, '#') - 1) ELSE mref END),
            (2, lower(CASE WHEN instr(mref, '#') > 0
                     THEN substr(mref, 1, instr(mref, '#') - 1) ELSE mref END)),
            (3, regexp_replace(lower(CASE WHEN instr(mref, '#') > 0
                     THEN substr(mref, 1, instr(mref, '#') - 1) ELSE mref END), '^k0+', 'k')),
            (4, CASE WHEN regexp_matches(lower(CASE WHEN instr(mref, '#') > 0
                     THEN substr(mref, 1, instr(mref, '#') - 1) ELSE mref END), '^[0-9]+$')
                     THEN 'k' || lower(CASE WHEN instr(mref, '#') > 0
                          THEN substr(mref, 1, instr(mref, '#') - 1) ELSE mref END)
                     ELSE lower(CASE WHEN instr(mref, '#') > 0
                          THEN substr(mref, 1, instr(mref, '#') - 1) ELSE mref END) END)
          ) AS t(variant_rank, variant)
        ) v
        WHERE mref <> ''
      ),
      universe AS (SELECT DISTINCT doc_id, key AS variant FROM live WHERE key IS NOT NULL)
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, ref,
             variant AS resolved_ref, CAST(variant_rank AS BIGINT) AS variant_rank
      FROM (
        SELECT p.*, ROW_NUMBER() OVER (PARTITION BY p.doc_id, p.span_idx
                                       ORDER BY p.variant_rank) AS rk
        FROM probes p JOIN universe u
          ON u.doc_id = p.doc_id AND u.variant = p.variant
      ) WHERE rk = 1"""

    out["cube_stats"] = """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""

    out["pivot_status"] = """
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
      FROM orders GROUP BY o_orderpriority"""

    # ---- geo_knn: the 81-offset disk join is plain relational SQL --------
    n_side = 1 << grid.FINE_RES
    # pts: every live span with its fine cell decomposed into (ix, iy)
    pts_cte = f"""
      pts AS (
        SELECT doc_id, span_idx, "offset", {fine} AS cell,
               CAST(FLOOR(CAST(FLOOR(({fine}) / 32) AS BIGINT) / 65536) AS BIGINT) AS ix,
               (CAST(FLOOR(({fine}) / 32) AS BIGINT) % 65536) AS iy
        FROM live WHERE key_num IS NOT NULL
      ),
      offs AS (
        SELECT a.dx, b.dy, GREATEST(ABS(a.dx), ABS(b.dy)) AS ring,
               a.dx * a.dx + b.dy * b.dy AS d2
        FROM (SELECT unnest(range(-4, 5)) AS dx) a,
             (SELECT unnest(range(-4, 5)) AS dy) b
      )"""
    nbr_expr = (
        f"(((((ix + o.dx) % {n_side}) + {n_side}) % {n_side}) * 65536"
        f" + ((((iy + o.dy) % {n_side}) + {n_side}) % {n_side})) * 32 + {grid.FINE_RES}"
    )
    out["geo_knn"] = f"""{cte}, {pts_cte.strip()},
      expd AS (
        SELECT p.doc_id, p.span_idx AS probe_id, o.ring, o.d2,
               {nbr_expr} AS nbr_cell
        FROM pts p, offs o
      ),
      j AS (
        SELECT e.doc_id, e.probe_id, c.span_idx AS cand_id, e.ring, e.d2,
               c."offset" AS cand_offset
        FROM expd e JOIN pts c ON c.doc_id = e.doc_id AND c.cell = e.nbr_cell
        WHERE c.span_idx <> e.probe_id
      )
      SELECT doc_id, CAST(probe_id AS BIGINT) AS probe_id,
             CAST(cand_id AS BIGINT) AS cand_id,
             CAST(ring AS BIGINT) AS ring, CAST(d2 AS BIGINT) AS d2
      FROM (SELECT j.*, ROW_NUMBER() OVER (PARTITION BY doc_id, probe_id
                       ORDER BY ring, d2, cand_offset, cand_id) AS rk FROM j)
      WHERE rk = 1"""

    # ---- geo_cascade_fallback: rank cascade + host/kNN/root chain --------
    out["geo_cascade_fallback"] = f"""{cte}, {_CASCADE_EDGES_SQL.strip()}, {pts_cte.strip()},
      unm AS (
        SELECT r.doc_id, r.span_idx, {coarse} AS coarse_cell,
               p.cell, p.ix, p.iy, p."offset", rt.root_idx
        FROM rank_result r
        JOIN live l ON l.doc_id = r.doc_id AND l.span_idx = r.span_idx
        JOIN pts p ON p.doc_id = r.doc_id AND p.span_idx = r.span_idx
        JOIN roots rt ON rt.doc_id = r.doc_id
        WHERE r.join_kind = 'fallback_root'
      ),
      att AS (
        SELECT r.doc_id, r.span_idx AS a_idx, {coarse} AS a_coarse,
               p.cell AS a_cell, l.kind AS a_kind, l."offset" AS a_offset
        FROM rank_result r
        JOIN live l ON l.doc_id = r.doc_id AND l.span_idx = r.span_idx
        JOIN pts p ON p.doc_id = r.doc_id AND p.span_idx = r.span_idx
        WHERE r.join_kind <> 'fallback_root'
      ),
      host AS (
        SELECT doc_id, span_idx, a_idx AS parent_idx,
               'fallback_host' AS join_kind
        FROM (
          SELECT u.doc_id, u.span_idx, a.a_idx,
                 ROW_NUMBER() OVER (PARTITION BY u.doc_id, u.span_idx
                   ORDER BY (a.a_kind <> 'html'), a.a_offset, a.a_idx) AS rk
          FROM unm u JOIN att a
            ON a.doc_id = u.doc_id AND a.a_coarse = u.coarse_cell
        ) WHERE rk = 1
      ),
      rem AS (
        SELECT u.* FROM unm u LEFT JOIN host h
          ON h.doc_id = u.doc_id AND h.span_idx = u.span_idx
        WHERE h.span_idx IS NULL
      ),
      rexp AS (
        SELECT r.doc_id, r.span_idx, o.ring, o.d2, {nbr_expr} AS nbr_cell
        FROM rem r, offs o
      ),
      knn AS (
        SELECT doc_id, span_idx, a_idx AS parent_idx,
               'fallback_knn' AS join_kind
        FROM (
          SELECT e.doc_id, e.span_idx, a.a_idx,
                 ROW_NUMBER() OVER (PARTITION BY e.doc_id, e.span_idx
                   ORDER BY e.ring, e.d2, a.a_offset, a.a_idx) AS rk
          FROM rexp e JOIN att a
            ON a.doc_id = e.doc_id AND a.a_cell = e.nbr_cell
        ) WHERE rk = 1
      ),
      rem2 AS (
        SELECT r.* FROM rem r LEFT JOIN knn k
          ON k.doc_id = r.doc_id AND k.span_idx = r.span_idx
        WHERE k.span_idx IS NULL
      )
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             CAST(parent_idx AS BIGINT) AS parent_idx, join_kind
      FROM (
        SELECT doc_id, span_idx, parent_idx, join_kind
        FROM rank_result WHERE join_kind <> 'fallback_root'
        UNION ALL SELECT doc_id, span_idx, parent_idx, join_kind FROM host
        UNION ALL SELECT doc_id, span_idx, parent_idx, join_kind FROM knn
        UNION ALL SELECT doc_id, span_idx, root_idx AS parent_idx,
                         'fallback_root' AS join_kind
        FROM rem2
      )"""

    # ---- geo_compact: bounded bottom-up quartet promotion ----------------
    compact_parts: list[str] = []
    compact_ctes = [f"lvl{grid.FINE_RES} AS (SELECT DISTINCT doc_id, {fine} AS cell FROM live)"]
    cur = f"lvl{grid.FINE_RES}"
    for r in range(grid.FINE_RES, grid.FINE_RES - 4, -1):
        par = grid.sql_cell_parent("cell", r, r - 1)
        compact_ctes.append(
            f"""p{r} AS (
              SELECT doc_id, {par} AS cell FROM {cur}
              GROUP BY doc_id, {par} HAVING COUNT(DISTINCT cell) = 4
            )"""
        )
        compact_ctes.append(
            f"""k{r} AS (
              SELECT l.doc_id, l.cell FROM {cur} l LEFT JOIN p{r} p
                ON p.doc_id = l.doc_id AND p.cell = {grid.sql_cell_parent('l.cell', r, r - 1)}
              WHERE p.cell IS NULL
            )"""
        )
        compact_parts.append(f"SELECT doc_id, cell FROM k{r}")
        cur = f"p{r}"
    compact_parts.append(f"SELECT doc_id, cell FROM {cur}")
    out["geo_compact"] = (
        f"{cte}, "
        + ", ".join(compact_ctes)
        + " SELECT doc_id, CAST(cell AS BIGINT) AS cell FROM ("
        + " UNION ALL ".join(compact_parts)
        + ")"
    )

    # ---- forest_roots: forest edges + exact pointer-doubling replay ------
    # doubling for t iterations is idempotent once converged, so a fixed
    # 10-step CTE chain replays forest.forest_roots (early-exit included)
    forest_core = forest_edges_sql.split("SELECT child_doc, parent_doc FROM (", 1)
    # MATERIALIZED is required: DuckDB inlines plain CTEs, so d10 would
    # otherwise expand to 2^10 copies of d0 (and 2^10 parquet re-opens)
    doubling = ["""d0 AS MATERIALIZED (
        SELECT d.doc_id, COALESCE(e.parent_doc, d.doc_id) AS anc
        FROM fdocs d LEFT JOIN fedges e ON e.child_doc = d.doc_id
      )"""]
    for i in range(1, 11):
        doubling.append(
            f"""d{i} AS MATERIALIZED (
              SELECT a.doc_id, COALESCE(b.anc, a.anc) AS anc
              FROM d{i - 1} a LEFT JOIN d{i - 1} b ON b.doc_id = a.anc
            )"""
        )
    out["forest_roots"] = f"""{forest_core[0].rstrip().rstrip(',')},
      fedges AS (
        SELECT child_doc, parent_doc FROM (
        {forest_core[1].rsplit(') WHERE rk = 1', 1)[0]}
        ) WHERE rk = 1
      ),
      fdocs AS (SELECT DISTINCT doc_id FROM live),
      {', '.join(doubling)}
      SELECT dd.doc_id, e.parent_doc, r.anc AS forest_root
      FROM fdocs dd
      LEFT JOIN fedges e ON e.child_doc = dd.doc_id
      JOIN d10 r ON r.doc_id = dd.doc_id"""

    # ---- simhash_pairs: bit-string replay of the 64-bit fingerprint ------
    from har2tree_spark.text.dedup import simhash_band_layout  # noqa: PLC0415

    layout = simhash_band_layout(9)  # max_hamming=8 -> bands=9
    band_cases = " ".join(
        f"WHEN {b} THEN substr(f, {64 - s - w + 1}, {w})"
        for b, (s, w) in enumerate(layout)
    )
    ham_expr = (
        "len(list_filter(range(1, 65), "
        "i -> substr(fa, CAST(i AS INTEGER), 1) <> substr(fb, CAST(i AS INTEGER), 1)))"
    )
    out["simhash_pairs"] = rf"""
      WITH toks AS (
        SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
      ),
      hx AS (SELECT id, list_transform(w, t -> substr(md5(t), 1, 16)) AS hs FROM toks),
      bits AS (
        SELECT id, b,
          CASE WHEN list_sum(list_transform(hs, h ->
            CASE WHEN ((strpos('0123456789abcdef',
                          substr(h, CAST((63 - b) // 4 AS INTEGER) + 1, 1)) - 1)
                       >> CAST(b % 4 AS INTEGER)) & 1 = 1
            THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END AS bit
        FROM hx, (SELECT unnest(range(0, 64)) AS b) rb
      ),
      fp AS (
        SELECT id, string_agg(bit, '' ORDER BY b DESC) AS f,
               SUM(CASE WHEN bit = '1' AND b < 63 THEN (1::BIGINT << CAST(b AS INTEGER))
                        WHEN bit = '1' THEN -9223372036854775808
                        ELSE 0 END) AS fl
        FROM bits GROUP BY id
      ),
      banded AS (
        SELECT id, f, fl, band, CASE band {band_cases} END AS bh
        FROM fp, (SELECT unnest(range(0, {len(layout)})) AS band) rb2
      ),
      okb AS (SELECT band, bh FROM banded GROUP BY band, bh HAVING COUNT(*) <= 64),
      bk AS (SELECT banded.* FROM banded JOIN okb USING (band, bh)),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               ANY_VALUE(a.f) AS fa, ANY_VALUE(b.f) AS fb,
               ANY_VALUE(a.fl) AS fla, ANY_VALUE(b.fl) AS flb
        FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
        GROUP BY a.id, b.id
      )
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
             CAST({ham_expr} AS BIGINT) AS hamming,
             CAST(fla AS BIGINT) AS simhash_a, CAST(flb AS BIGINT) AS simhash_b
      FROM pairs WHERE {ham_expr} <= 8"""

    # ---- attrs family -----------------------------------------------------
    key_re = r"^k(0|[1-9][0-9]{0,14})$"
    out["pages_root_fill"] = f"""{cte},
      pg AS (
        SELECT doc_id, span_idx, "offset",
               CASE WHEN kind NOT IN ('img', 'js') THEN {coarse} END AS cc
        FROM live
      ),
      filled AS (
        SELECT doc_id, span_idx, "offset",
               COALESCE(cc, FIRST_VALUE(cc IGNORE NULLS) OVER (
                 PARTITION BY doc_id ORDER BY "offset", span_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               )) AS page_cell
        FROM pg
      )
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             CAST(page_cell AS BIGINT) AS page_cell,
             CAST(FIRST_VALUE(span_idx) OVER (
               PARTITION BY doc_id, page_cell ORDER BY "offset", span_idx
             ) AS BIGINT) AS page_root_idx
      FROM filled"""

    reftoks = (
        "list_filter(string_split(text, ' '), "
        f"t -> regexp_matches(t, '{key_re}') AND t IS DISTINCT FROM key)"
    )
    out["resources_hashes"] = f"""{cte}
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             CAST(len(arr) AS BIGINT) AS n_hashes,
             array_to_string(arr, ',') AS resources_hashes
      FROM (
        SELECT doc_id, span_idx,
               list_sort(list_distinct(
                 (CASE WHEN text <> '' THEN [sha256(text)]
                       ELSE []::VARCHAR[] END)
                 || list_transform({reftoks}, t -> sha256(t))
               )) AS arr
        FROM live
      )"""

    mcell = grid.sql_cell("CAST(SUBSTR(marker, 2, 18) AS BIGINT)", grid.COARSE_RES)
    out["marker_rollup"] = f"""{cte},
      mk AS (
        SELECT doc_id, span_idx, {coarse} AS cc, t.marker
        FROM live, LATERAL (SELECT unnest({reftoks}) AS marker) t
      )
      SELECT doc_id, CAST({mcell} AS BIGINT) AS zone_cell,
             CAST(COUNT(DISTINCT marker) AS BIGINT) AS n_markers,
             CAST(COUNT(DISTINCT CASE WHEN {mcell} <> cc THEN marker END)
                  AS BIGINT) AS n_cross_zone,
             CAST(COUNT(DISTINCT span_idx) AS BIGINT) AS n_receivers
      FROM mk GROUP BY doc_id, {mcell}"""

    out["identifiers"] = f"""{cte}
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             CAST(len(ids) AS BIGINT) AS n_ids,
             array_to_string(ids, ',') AS identifiers
      FROM (SELECT doc_id, span_idx,
                   list_sort(list_distinct(regexp_extract_all(text, 'k[0-9]+')))
                     AS ids
            FROM live)"""

    out["key_class"] = f"""{cte},
      mangled AS (
        SELECT doc_id, span_idx,
               CASE WHEN media_ref = '' THEN ''
                    WHEN span_idx % 4 = 0 THEN substr(media_ref, 2)
                    WHEN span_idx % 4 = 1 THEN 'xn--' || reverse(media_ref)
                    WHEN span_idx % 4 = 2 THEN media_ref
                    ELSE upper(media_ref) END AS ref
        FROM live
      )
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, ref,
             CASE WHEN ref = '' THEN 'none'
                  WHEN regexp_matches(ref, '{key_re}') THEN 'canonical'
                  WHEN regexp_matches(ref, '^[0-9]+$') THEN 'numeric'
                  WHEN regexp_matches(ref, '^xn--') THEN 'encoded'
                  ELSE 'other' END AS ref_class,
             CASE WHEN ref = '' THEN ''
                  WHEN regexp_matches(ref, '{key_re}') THEN ref
                  WHEN regexp_matches(ref, '^[0-9]+$') THEN 'k' || ref
                  WHEN regexp_matches(ref, '^xn--') THEN reverse(substr(ref, 5))
                  ELSE lower(ref) END AS decoded_ref
      FROM mangled"""

    b64_re = "^[A-Za-z0-9+/]+={0,2}$"
    b64_nopad_re = "^[A-Za-z0-9+/]+$"
    form_re = "^[A-Za-z0-9_.~%+-]+=[A-Za-z0-9_.~%+&=-]*$"
    # 18-kind shape dispatch, priority-ordered exactly like
    # har2tree_spark.operators.decode.decode_dispatch
    out["decode_dispatch"] = f"""{cte},
      pay AS (
        SELECT doc_id, span_idx,
               CASE span_idx % 16
                 WHEN 0 THEN 'data:text/plain;base64,' || to_base64(encode(text))
                 WHEN 1 THEN to_base64(encode(text))
                 WHEN 2 THEN regexp_replace(to_base64(encode(text)), '=+$', '')
                 WHEN 3 THEN hex(text)
                 WHEN 4 THEN '{{"v":"' || text || '"}}'
                 WHEN 5 THEN 'p ' || text
                 WHEN 6 THEN '--bnd' || chr(10)
                             || 'content-disposition: form-data; name="f0"'
                             || chr(10) || chr(10) || text || chr(10)
                             || '--bnd' || chr(10)
                             || 'content-disposition: form-data; name="f1"'
                             || chr(10) || chr(10) || split_part(text, ' ', 1)
                             || chr(10) || '--bnd--'
                 WHEN 7 THEN 'k=' || replace(text, ' ', '+')
                             || '&pct=%6B' || substr(split_part(text, ' ', 1), 2)
                             || '%20end'
                 WHEN 8 THEN chr(31) || chr(65533) || chr(8) || text
                 WHEN 9 THEN '{{"a":"' || split_part(text, ' ', 1)
                      || '"}}{{"b":"' || split_part(text, ' ', 2) || '"}}'
                 WHEN 10 THEN '<r a="' || split_part(text, ' ', 1) || '"><v>'
                      || split_part(text, ' ', 2) || '</v></r>'
                 WHEN 11 THEN translate(to_base64(encode(text || '?????')), '+/', '-_')
                 WHEN 12 THEN '$ion_1_0 ' || text
                 WHEN 13 THEN 'data:application/dns-message;base64,'
                              || to_base64(encode(text))
                 WHEN 14 THEN 'data:application/x-protobuf,' || text
                 ELSE to_base64(encode(text
                        || repeat('?', (3 - length(text) % 3) % 3))) || '='
               END AS p
        FROM live
      ),
      d AS (
        SELECT doc_id, span_idx, p,
               split_part(p, ',', 1) AS hdr, split_part(p, ',', 2) AS body,
               -- reference-direction framing normalization
               -- (nodes.py:386-390): LF->CRLF unless CRLF already present
               regexp_extract_all(
                 CASE WHEN contains(p, chr(13) || chr(10)) THEN p
                      ELSE replace(p, chr(10), chr(13) || chr(10)) END,
                 '(?s)\r\n\r\n(.*?)\r\n--', 1) AS mparts,
               (p LIKE (chr(31) || chr(65533) || chr(8) || '%')) AS garbled,
               regexp_matches(p, '^--[A-Za-z0-9]+\r?\n') AS is_mp,
               (regexp_matches(p, '^[0-9a-fA-F]+$') AND length(p) % 2 = 0)
                 AS hexish,
               (regexp_matches(p, '{b64_re}') AND length(p) % 4 = 0) AS b64ish,
               (regexp_matches(p, '{b64_nopad_re}') AND length(p) % 4 <> 1
                AND length(p) % 4 <> 0) AS b64_fixable,
               (regexp_matches(p, '^[A-Za-z0-9+/]+=$') AND length(p) % 4 = 1)
                 AS b64_trailpad,
               ((p LIKE '%-%' OR p LIKE '%\\_%' ESCAPE '\\')
                AND regexp_matches(p, '^[A-Za-z0-9_-]+=$')
                AND length(p) % 4 = 1) AS u_trailpad,
               split_part(substr(split_part(p, ',', 1), 6), ';', 1) AS mime,
               starts_with(p, '$ion_') AS ion_text,
               ((p LIKE '%-%' OR p LIKE '%\\_%' ESCAPE '\\')
                AND regexp_matches(p, '^[A-Za-z0-9_-]+={{0,2}}$')
                AND length(p) % 4 = 0) AS u_padded,
               ((p LIKE '%-%' OR p LIKE '%\\_%' ESCAPE '\\')
                AND regexp_matches(p, '^[A-Za-z0-9_-]+$')
                AND length(p) % 4 <> 1 AND length(p) % 4 <> 0) AS u_fixable,
               (regexp_matches(p, '{form_re}') AND NOT contains(
                  regexp_replace(p, '%[0-9A-Fa-f]{{2}}', '', 'g'), '%'))
                 AS formish,
               (p LIKE '{{%' AND regexp_matches(p, '\\}}\\{{')) AS jstream
        FROM pay
      ),
      db AS (
        SELECT *,
               (p LIKE 'data:%'
                AND starts_with(mime, 'application/x-amzn-ion')) AS ion_uri,
               (p LIKE 'data:%'
                AND starts_with(mime, 'application/dns-message')) AS dns_uri,
               (p LIKE 'data:%' AND mime IN ('application/grpc-web+proto',
                  'application/x-protobuf', 'application/proto',
                  'application/x-protobuffer')) AS pb_uri,
               (hdr LIKE '%;base64%' AND regexp_matches(body, '{b64_re}')
                AND length(body) % 4 = 0) AS duri_ok
        FROM d
      ),
      d2 AS (
        SELECT doc_id, span_idx,
             CASE WHEN p = '' THEN 'empty'
                  WHEN garbled THEN 'gzip_garbled'
                  WHEN ion_text OR ion_uri THEN 'ion'
                  WHEN dns_uri THEN 'dns_wire'
                  WHEN pb_uri THEN 'protobuf'
                  WHEN p LIKE 'data:%' AND hdr LIKE '%;base64%' THEN 'data_uri_b64'
                  WHEN p LIKE 'data:%' THEN 'data_uri_raw'
                  WHEN is_mp THEN 'multipart'
                  WHEN hexish THEN 'hex'
                  WHEN b64ish THEN 'base64'
                  WHEN b64_fixable THEN 'base64_padfix'
                  WHEN b64_trailpad THEN 'base64_trailpad'
                  WHEN u_padded OR u_fixable OR u_trailpad THEN 'base64_url'
                  WHEN formish THEN 'form_urlencoded'
                  WHEN jstream THEN 'json_stream'
                  WHEN p LIKE '{{%' OR p LIKE '[%' THEN 'json'
                  WHEN p LIKE '<%' THEN 'xml'
                  ELSE 'plain' END AS decode_kind,
             CASE WHEN garbled THEN FALSE
                  WHEN ion_text OR ion_uri OR dns_uri OR pb_uri THEN FALSE
                  WHEN p LIKE 'data:%' AND hdr LIKE '%;base64%'
                    THEN regexp_matches(body, '{b64_re}') AND length(body) % 4 = 0
                  WHEN NOT (p LIKE 'data:%') AND is_mp THEN len(mparts) > 0
                  ELSE TRUE END AS decode_ok,
             CASE WHEN p = '' THEN ''
                  WHEN garbled THEN p
                  WHEN ion_text THEN p
                  WHEN ion_uri OR dns_uri OR pb_uri
                    THEN CASE WHEN duri_ok THEN decode(from_base64(body))
                              ELSE body END
                  WHEN p LIKE 'data:%' AND hdr LIKE '%;base64%'
                    THEN CASE WHEN regexp_matches(body, '{b64_re}') AND length(body) % 4 = 0
                              THEN decode(from_base64(body)) ELSE '' END
                  WHEN p LIKE 'data:%' THEN body
                  WHEN is_mp THEN array_to_string(mparts, chr(10))
                  WHEN hexish THEN decode(from_hex(p))
                  WHEN b64ish THEN decode(from_base64(p))
                  WHEN b64_fixable
                    THEN decode(from_base64(p || repeat('=', (4 - length(p) % 4) % 4)))
                  WHEN b64_trailpad
                    THEN decode(from_base64(substr(p, 1, length(p) - 1)))
                  WHEN u_padded THEN decode(from_base64(translate(p, '-_', '+/')))
                  WHEN u_fixable
                    THEN decode(from_base64(translate(p, '-_', '+/')
                                || repeat('=', (4 - length(p) % 4) % 4)))
                  WHEN u_trailpad
                    THEN decode(from_base64(
                          translate(substr(p, 1, length(p) - 1), '-_', '+/')))
                  WHEN formish THEN
                    replace(replace(replace(p, '+', ' '), '%6B', 'k'),
                            '%20', ' ')
                  WHEN jstream
                    THEN '[' || regexp_replace(p, '\\}}\\{{', '}},{{', 'g') || ']'
                  ELSE p END AS decoded
        FROM db
      )
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
             decode_kind, decode_ok, decoded,
             CAST(CASE WHEN decoded IS NULL OR decoded = '' THEN 0
                       ELSE length(decoded) END AS BIGINT) AS decoded_size
      FROM d2"""

    out["span_attrs"] = f"""{cte},
      hdr AS (
        SELECT doc_id, span_idx,
               list_transform(range(1, len(w) + 1),
                 i -> {{'name': 'H' || CAST((i - 1) % 3 AS VARCHAR),
                        'value': w[CAST(i AS INTEGER)]}}) AS headers
        FROM (SELECT doc_id, span_idx, string_split(text, ' ') AS w FROM live)
      ),
      tim AS (
        SELECT doc_id, span_idx,
               strftime(make_timestamp((1600000000 + "offset") * 1000000),
                        '%Y-%m-%d %H:%M:%S') AS start_ts,
               CAST(1600000000 + "offset" AS BIGINT) AS start_epoch,
               CAST(COALESCE(LEAD("offset") OVER (
                      PARTITION BY doc_id ORDER BY "offset", span_idx
                    ) - "offset", 0) AS BIGINT) AS duration_s
        FROM live
      )
      SELECT t.doc_id, CAST(t.span_idx AS BIGINT) AS span_idx,
             t.start_ts, t.start_epoch, t.duration_s,
             list_extract(list_filter(h.headers,
               x -> lower(x['name']) = 'h1'), 1)['value'] AS h1_value,
             list_extract(list_filter(h.headers,
               x -> lower(x['name']) = 'h2'), 1)['value'] AS h2_value
      FROM tim t JOIN hdr h
        ON h.doc_id = t.doc_id AND h.span_idx = t.span_idx"""

    out["sidecar_join"] = """
      SELECT CAST(d.doc_id AS BIGINT) AS doc_id, s.side_len, s.side_tag
      FROM documents d
      LEFT JOIN (
        SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS side_len,
               'even' AS side_tag
        FROM documents WHERE doc_id % 2 = 0
      ) s ON s.doc_id = d.doc_id"""

    out["ref_cleanup"] = f"""{cte},
      raw AS (
        SELECT doc_id, span_idx,
               CASE span_idx % 5
                 WHEN 0 THEN '"' || media_ref || '"'
                 WHEN 1 THEN 'about:' || media_ref
                 WHEN 2 THEN media_ref || ' trailing junk'
                 WHEN 3 THEN '''' || media_ref || ''''
                 ELSE media_ref
               END AS raw_ref
        FROM live
      ),
      st AS (
        SELECT doc_id, span_idx, raw_ref,
               split_part(
                 CASE WHEN regexp_matches(trim(raw_ref), '^".*"$')
                        OR regexp_matches(trim(raw_ref), '^''.*''$')
                      THEN trim(substr(trim(raw_ref), 2,
                                       length(trim(raw_ref)) - 2))
                      ELSE trim(raw_ref) END, ' ', 1) AS first_tok
        FROM raw
      )
      SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, raw_ref,
             CASE WHEN first_tok = '' THEN NULL
                  WHEN first_tok LIKE 'local:%' OR first_tok LIKE 'about:%'
                       OR first_tok LIKE 'data:%' THEN NULL
                  ELSE first_tok END AS clean_ref,
             CASE WHEN first_tok = '' THEN 'empty'
                  WHEN first_tok LIKE 'local:%' OR first_tok LIKE 'about:%'
                       OR first_tok LIKE 'data:%' THEN 'local_only'
                  ELSE NULL END AS drop_reason
      FROM st"""

    zone = grid.sql_cell("CAST(SUBSTR(tok, 2, 18) AS BIGINT)", grid.COARSE_RES)
    pixcell = grid.sql_cell("CAST(SUBSTR(tok, 2, 18) AS BIGINT)", grid.FINE_RES)
    out["geo_zonal"] = f"""{cte},
      pix AS (
        SELECT doc_id, span_idx, tok
        FROM (SELECT doc_id, span_idx, unnest(string_split(text, ' ')) AS tok
              FROM live)
        WHERE regexp_matches(tok, '^k[0-9]+$')
      )
      SELECT {zone} AS zone_cell,
             CAST(COUNT(*) AS BIGINT) AS n_pixels,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT {pixcell}) AS BIGINT) AS n_cells
      FROM pix GROUP BY 1"""

    return out
