"""Physical-plan assertions — the plans we WANT, not just plans that pass.

Checks pushdown, pruning, shuffle counts and codegen on the engine's key
operators (SURVEY.md §4: filters/projections must reach the parquet scan;
doc-local work must not shuffle; the tile rollup gets exactly its one
aggregation exchange)."""

import re

from pyspark.sql import functions as F

from har2tree_spark.datagen import gen_documents_df
from har2tree_spark.geo import grid
from har2tree_spark.operators import tiling, zonal
from har2tree_spark.operators.cascade import resolve_exact
from har2tree_spark.operators.parse import parse_documents


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_exchanges(plan: str) -> int:
    # formatted plans list each node in the tree AND as a "(n) Exchange"
    # detail block — count the detail headers only
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_parse_is_narrow(spark, tmp_path):
    p = str(tmp_path / "docs")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    feats = parse_documents(spark.read.parquet(p))
    plan = _plan(feats)
    assert _n_exchanges(plan) == 0, "parse must not shuffle"
    assert "codegen id" in plan  # whole-stage codegen active
    # the parse expression chain must appear ~once, not once per output
    # column (the regression this guards: CollapseProject re-embedding the
    # chain into root_idx/n_live and evaluating it per exploded row)
    assert plan.count("RLIKE") <= 4, f"parse chain duplicated: {plan.count('RLIKE')}"


def test_tile_assignment_is_narrow(spark, tmp_path):
    p = str(tmp_path / "docs2")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    tiles = tiling.tile_assignment(parse_documents(spark.read.parquet(p)))
    assert _n_exchanges(_plan(tiles)) == 0, "tile assignment is a projection"


def test_tile_rollup_single_shuffle(spark, tmp_path):
    p = str(tmp_path / "docs3")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    roll = tiling.tile_rollup(
        tiling.tile_assignment(parse_documents(spark.read.parquet(p)))
    )
    plan = _plan(roll)
    assert _n_exchanges(plan) == 1, f"rollup = exactly one agg exchange:\n{plan}"
    assert "partial" in plan.lower() or "HashAggregate" in plan  # map-side combine


def test_cascade_exact_single_shuffle(spark, tmp_path):
    p = str(tmp_path / "docs4")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    jr = resolve_exact(parse_documents(spark.read.parquet(p)))
    plan = _plan(jr)
    # one Exchange (hash by doc_id), then sort + python map — nothing else
    assert _n_exchanges(plan) == 1, plan
    assert "MapInArrow" in plan or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan


def test_filter_pushdown_to_scan(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_returnflag", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    # column pruning: ReadSchema carries only the needed columns
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema


def test_broadcast_join_for_small_dim(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    q = li.join(nation, li["l_suppkey"] == nation["s_suppkey"])
    assert "BroadcastHashJoin" in _plan(q)


def test_zonal_by_cell_single_shuffle(spark, tmp_path):
    p = str(tmp_path / "docs5")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    pix = zonal.rasterize_spans(parse_documents(spark.read.parquet(p)))
    zs = zonal.zonal_stats_by_cell(pix, grid.COARSE_RES)
    assert _n_exchanges(_plan(zs)) <= 2  # distinct-agg needs its expand exchange


def test_attr_family_narrow(spark, tmp_path):
    """resources_hashes / identifiers / key_class / decode_dispatch are pure
    projections: zero shuffles, whole-stage codegen."""
    from har2tree_spark.operators import attrs, decode

    p = str(tmp_path / "docs6")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    feats = parse_documents(spark.read.parquet(p))
    for df in (
        attrs.resources_hashes(feats),
        attrs.identifiers_extract(feats),
        attrs.key_class(feats),
        decode.decode_dispatch(feats.withColumn("payload", F.col("text"))),
    ):
        plan = _plan(df)
        assert _n_exchanges(plan) == 0, plan
        assert "codegen id" in plan


def test_marker_rollup_single_shuffle(spark, tmp_path):
    from har2tree_spark.operators import attrs

    p = str(tmp_path / "docs7")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    feats = parse_documents(spark.read.parquet(p))
    roll = attrs.marker_rollup(attrs.marker_extract(feats))
    # distinct-aggregates expand once; no other exchange beyond the agg pair
    assert _n_exchanges(_plan(roll)) <= 2


def test_rank_cascade_plan_shape(spark, tmp_path):
    import re

    from har2tree_spark.operators.cascade import resolve_rank

    p = str(tmp_path / "docs9")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    feats = parse_documents(spark.read.parquet(p))
    plan = _plan(resolve_rank(feats))
    # formatted plans list each node in the tree AND as a "(n) <Node>"
    # detail block — count the detail headers only
    joins = len(
        re.findall(
            r"\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan
        )
    )
    # ONE probe->target join produces all five candidate stages (r8: the
    # five per-stage joins were restructured into a single equi-join on
    # (doc_id, pointer)); the root-fallback must be a union edge resolved
    # in the winners' aggregate, NOT an anti-join that duplicates the
    # whole candidate subtree as a common subexpression
    assert joins == 1, f"rank cascade must plan exactly 1 join, got {joins}"
    assert "LeftAnti" not in plan
    # the join must be SHUFFLED-HASH reusing the window's (doc_id, key)
    # partitioning on the target side (default SPARK_GRAFT_CASCADE_JOIN):
    # no driver broadcast build, and the probe/window input exchanges
    # materialize concurrently
    assert re.search(r"\(\d+\) ShuffledHashJoin", plan), plan
    assert "BroadcastExchange" not in plan
    # one exchange for the target-side redirect-prefix window (reused by
    # the join), one for the probe side of the shuffled join, one for the
    # winners' min_by aggregate; the edge-dedup shuffle must stay gone,
    # and the winner pick must be an aggregate that partial-combines
    # map-side (min_by plans as SortAggregate partial+final — struct
    # buffers are not HashAggregate-able), not a row_number window over
    # the full edge fan-out
    assert _n_exchanges(plan) <= 3, plan
    assert re.search(r"\(\d+\) (?:SortAggregate|ObjectHashAggregate|HashAggregate)", plan), plan


def test_lsh_fused_signatures_match_per_table(spark):
    import numpy as np

    from har2tree_spark.ann import knn

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fused = df.select(
        "vec_id", knn.hyperplane_signatures(16, 8, 3)("embedding").alias("sigs")
    ).toPandas()
    for t in range(3):
        single = df.select(
            "vec_id", knn.hyperplane_signature(16, 8, t)("embedding").alias("b")
        ).toPandas()
        merged = fused.merge(single, on="vec_id")
        assert all(s[t] == b for s, b in zip(merged.sigs, merged.b)), f"table {t}"


def test_tree_json_single_shuffle(spark, tmp_path):
    from har2tree_spark.operators import export
    from har2tree_spark.operators.cascade import resolve_rank

    p = str(tmp_path / "docs8")
    gen_documents_df(spark, 50, seed=3).write.parquet(p)
    feats = parse_documents(spark.read.parquet(p))
    jr = resolve_rank(feats)
    plan = _plan(export.tree_json(jr, feats))
    # the cascade's own exchanges inline into this plan; tree_json itself
    # must add at most 2 (the explicit doc_id repartition feeding
    # mapInPandas + the feature join, which broadcasts at this scale)
    assert "MapInPandas" in plan
    assert _n_exchanges(plan) <= _n_exchanges(_plan(jr)) + 2, plan


def test_simhash_no_python_stage(spark):
    """The SimHash fold is pure F.* now: no Arrow/row Python eval node may
    appear anywhere in the pairs plan (VERDICT r3 #2)."""
    from har2tree_spark.text import dedup

    rows = [(i, f"tok{i} alpha beta gamma delta") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = _plan(dedup.simhash_pairs(df, max_hamming=3))
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, f"{node} in simhash plan"


def test_ivf_assignment_partial_agg(spark):
    """The corpus->inverted-list assignment (n_lists=1) must be a max_by
    aggregation with map-side partial combine — not a row_number window
    sorting K x the corpus (VERDICT r3 #6)."""
    import numpy as np

    from har2tree_spark.ann import ivf

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf.sampled_centroids(df, 8)
    lists = ivf._assign(df, cents, 1, "neighbor_id", "nv", "vec_id", "embedding")
    plan = _plan(lists)
    assert "max_by" in plan and "partial" in plan.lower(), plan
    assert "(1) Window" not in plan and " Window" not in plan, plan
    # the nprobe>1 probe path keeps its window (natural top-n shape)
    probes = ivf._assign(df, cents, 4, "query_id", "qv", "vec_id", "embedding")
    assert "Window" in _plan(probes)


def test_minhash_single_pair_exchange(spark):
    """The r6 minhash rewrite promises: the window pre-cap and the
    bucket-collect groupBy share ONE HashPartitioning(band, bh) exchange
    (no second exchange between them), no joins anywhere, and exactly 3
    exchanges total in the pairs plan: the parallelism repartition, the
    bucket exchange, and the pair-dedup exchange."""
    from har2tree_spark.text import dedup

    rows = [(i, f"w{i % 7} alpha beta gamma delta eps zeta") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = _plan(dedup.minhash_lsh_pairs(df))
    assert "Join" not in plan, "minhash pairs plan must be join-free"
    assert _n_exchanges(plan) == 3, plan


def test_cookie_surface_single_scan(spark, tmp_path):
    """r7 VERDICT #4: the cookie table comes from the captures reader's
    single pass.  read_har_cookies' plan must contain exactly ONE
    binaryFile scan and ONE per-capture build (the captures reader's
    FlatMapGroupsInPandas) — no second listing, no cookie-specific
    re-parse; capture_report's executed plan must contain NO binaryFile
    scan at all (its one scan runs inside the eager caps checkpoint)."""
    import json

    from har2tree_spark.pipeline import capture_report
    from har2tree_spark.sources import har_cookies

    root = tmp_path / "caps"
    root.mkdir()
    har = {
        "log": {
            "entries": [
                {
                    "startedDateTime": "2024-01-01T00:00:00.000Z",
                    "request": {"url": "http://a.example/", "cookies": [
                        {"name": "s", "value": "1"}]},
                    "response": {"status": 200, "content": {"text": "hi"},
                                 "cookies": [{"name": "r", "value": "2",
                                              "domain": ".a.example"}]},
                }
            ]
        }
    }
    (root / "cap.har").write_text(json.dumps(har))

    ck = har_cookies.read_har_cookies(spark, str(root))
    plan = ck._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan binaryFile") == 1, plan
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert plan.count("MapInPandas") == 0, plan
    rows = {(r["direction"], r["cookie"], r["domain"], r["is_3rd_party"])
            for r in ck.collect()}
    assert rows == {
        ("sent", "s=1", "a.example", False),
        ("received", "r=2", "a.example", False),
    }

    rep = capture_report(spark, str(root))
    rplan = rep._jdf.queryExecution().executedPlan().toString()
    assert rplan.count("Scan binaryFile") == 0, rplan
    assert rplan.count("FlatMapGroupsInPandas") == 0, rplan
