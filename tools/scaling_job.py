"""One scaling-bench run: full pipeline over a pre-generated corpus at a
given parallelism. Invoked as a separate process per parallelism level so
each run gets its own JVM (the spark-submit analogue):

    SPARK_GRAFT_CPUS=8 python tools/scaling_job.py /path/corpus

Prints one JSON line {parallelism, docs, spans, join_rows, wall_s,
docs_per_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from har2tree_spark.operators import cascade, parse, stats, tiling  # noqa: E402
from har2tree_spark.session import get_spark  # noqa: E402


def main() -> None:
    corpus = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # shuffle partitions scale with the core count, as they would with
    # executor count on a cluster (BASELINE.md protocol); 4 tasks per core
    # so the scheduler absorbs stragglers instead of the slowest partition
    # gating the stage
    spark = get_spark(
        f"scaling_{cpus}", parallelism=cpus, shuffle_partitions=4 * cpus,
        driver_memory="24g",
    )
    docs = spark.read.parquet(corpus)
    # warm-up (excluded from timing): JVM task-thread + python-worker spawn
    # and codegen compilation are cold-start costs a long-lived cluster
    # amortizes away; without this they dominate the small-N run's wall
    import pandas as _pd  # noqa: PLC0415

    spark.range(0, cpus * 1000, numPartitions=cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    t0 = time.time()
    phases = {}
    # Materialization strategy (measured at 600k docs):
    #  - parse ONCE: the slim scalar projection (text/ref_tokens dropped —
    #    caching array<string> JVM objects costs more than the parse) is
    #    eagerly materialized and feeds BOTH the cascade and the tiles; the
    #    kernel needs only scalar columns, so nothing re-parses;
    #  - cache the flat cascade output (cheap, reused by stats).
    feats = parse.parse_documents(docs)
    slim = feats.drop("text", "ref_tokens").persist()
    t1 = time.time()
    slim.count()
    phases["parse_s"] = round(time.time() - t1, 2)
    jr = cascade.resolve_exact(slim).persist()
    t1 = time.time()
    n_join = jr.count()
    phases["cascade_s"] = round(time.time() - t1, 2)
    t1 = time.time()
    tiles = tiling.tile_assignment(slim)
    n_tiles = tiling.tile_rollup(tiles).count()
    phases["tiles_s"] = round(time.time() - t1, 2)
    t1 = time.time()
    st = stats.doc_stats(slim, jr)
    n_docs = st.count()
    phases["stats_s"] = round(time.time() - t1, 2)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "parallelism": cpus,
                "docs": n_docs,
                "join_rows": n_join,
                "tile_rollups": n_tiles,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 2),
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
