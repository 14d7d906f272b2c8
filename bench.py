"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set = the engine's flagship pipeline stages plus representative
operator-shape queries; `gen_pipeline_20k` runs the full exact cascade over
a 20k-doc generated corpus (the docs/sec figure BASELINE.md tracks).
The two-parallelism scaling evidence (N vs 4N) lives in
tools/bench_scaling.py -> BENCH/BASELINE.md.

Measurement protocol (r7): every query runs $SPARK_GRAFT_REPEATS full
passes (default 3) in interleaved round-robin order — the whole suite,
then the whole suite again — with a $SPARK_GRAFT_COOLDOWN-second pause
between passes (default 2).  The recorded per-query figure is the BEST
sample; all samples are disclosed in the "samples" field.  Rationale
(BENCH/BASELINE.md variance analysis, r6): this host shows episodic
4-10x spikes under shared I/O load; a single contended sample recorded a
+20% phantom regression on untouched code two rounds running.
Interleaving decorrelates a spike from any one query; best-of is the
engine's speed, the spread is the host's.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from har2tree_spark.datagen import GenConfig, gen_documents_df  # noqa: E402
from har2tree_spark.operators import cascade, parse, tiling  # noqa: E402
from har2tree_spark.session import get_spark  # noqa: E402
from har2tree_spark.sources import events_spans  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default 16, not 32: Python-stage jobs (mapInPandas kernels) spawn ~2
    # threads/core of worker traffic, so local[32] on a 32-core host measures
    # scheduler contention, not engine speed (see BENCH/BASELINE.md variance
    # analysis). $SPARK_GRAFT_CPUS still wins when the driver sets it.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    # shuffle partitions at 4x cores: enough tasks per stage that one
    # straggler cannot gate the whole stage
    spark = get_spark(
        "bench", parallelism=cpus, shuffle_partitions=4 * cpus, driver_memory="24g"
    )

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    cooldown = float(os.environ.get("SPARK_GRAFT_COOLDOWN", "2"))
    samples: dict[str, list[float]] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        samples.setdefault(name, []).append(round(time.time() - t0, 3))
        return n

    # untimed warmup: JVM codegen, parquet footers, Python workers + their
    # numpy/pandas imports. On a cluster these are one-time executor costs,
    # not per-query engine throughput, so they are excluded from timings.
    spark.range(0, 1 << 14, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()
    wgen = gen_documents_df(spark, 200, seed=1, cfg=GenConfig(max_spans=16))
    cascade.resolve_exact(parse.parse_documents(wgen)).count()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).count()

    docs = events_spans.documents_from_events(spark, sf_dir)
    gen = gen_documents_df(spark, 20000, seed=42, cfg=GenConfig(max_spans=32))
    n_docs = 0

    for r in range(repeats):
        if r and cooldown:
            time.sleep(cooldown)
        # q1: full exact pipeline over events-derived docs (flagship).
        # parse output is eagerly checkpointed INSIDE q1's timing (q1 is
        # still the full chain), then reused by q2/q3 — the parse-once
        # fan-out that pipeline.run_pipeline ships; re-parsing per query
        # would benchmark a plan no user runs.
        feats = None

        def _q1():
            nonlocal feats
            feats = parse.parse_documents(docs).localCheckpoint()
            return cascade.resolve_exact(feats).count()

        timed("q1_cascade_exact", _q1)
        # q2: relational rank cascade (candidate joins + window)
        timed("q2_cascade_rank", lambda: cascade.resolve_rank(feats).count())
        # q3: tiling + per-tile rollup
        timed(
            "q3_tile_rollup",
            lambda: tiling.tile_rollup(tiling.tile_assignment(feats)).count(),
        )
        # q4: generated 20k-doc corpus, full exact pipeline (docs/sec)
        n_docs = timed(
            "q4_gen20k_exact",
            lambda: cascade.resolve_exact(parse.parse_documents(gen))
            .select("doc_id")
            .distinct()
            .count(),
        )
        # q5/q6: relational operator shapes
        timed("q5_tpch_q1", lambda: entrymod.q_tpch_q1(spark, sf_dir).count())
        timed("q6_hhhash", lambda: entrymod.q_hhhash(spark, sf_dir).count())
        # q7/q8: training-data operators (dedup + ANN)
        timed("q7_minhash_lsh", lambda: entrymod.q_dedup_minhash(spark, sf_dir).count())
        timed("q8_ann_lsh", lambda: entrymod.q_ann_lsh(spark, sf_dir).count())

    timings = {name: min(vals) for name, vals in samples.items()}
    gen_best = timings["q4_gen20k_exact"]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "gen_docs_per_sec": round(n_docs / gen_best, 1) if gen_best else None,
                "cpus": cpus,
                "repeats": repeats,
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
