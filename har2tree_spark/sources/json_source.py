"""JSON document source — the S1 scan in the reference's native format.

The reference ingests HAR files, i.e. one JSON document per capture
(reference har2tree.py:1053-1074 reads and `json.load`s each file;
parser.py:69 holds it in RAM). Re-grounded: JSON-lines (or a directory of
them) with the engine's documents schema, read by Spark's native JSON
source — distributed, schema-enforced, and predicate-prunable after the
first pass.

Malformed records follow the engine's quarantine contract (S3): Spark's
PERMISSIVE mode routes unparseable lines into ``_corrupt_record`` instead
of failing the job (the Har2TreeError analogue, har2tree.py:244-248);
``read_documents_json`` splits them off so the clean frame matches
DOCUMENTS_SCHEMA exactly and the quarantine frame keeps the raw line for
lineage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from har2tree_spark.schema import DOCUMENTS_SCHEMA

CORRUPT_COL = "_corrupt_record"


def _read_schema() -> T.StructType:
    return T.StructType(
        list(DOCUMENTS_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_documents_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(documents, quarantine) from JSON-lines at ``path``.

    documents matches DOCUMENTS_SCHEMA; quarantine is (raw) — one row per
    malformed (unparseable or doc_id-less) input line. The two frames
    partition the input exactly.

    ONE lazy PERMISSIVE scan feeds both frames (r4 ADVICE): the clean
    frame and the quarantine are filters over the same read, so they
    share one file index — the file set is listed once and cannot
    desynchronize between the frames, and no eager checkpoint is needed
    (at 100 TB an eager checkpoint of the raw input doubles ingest I/O
    before the first filter runs).

    Parse pin: under Spark's JSON column pruning, malformed-ness is only
    detected in the columns a query actually parses, so a record with a
    type-mismatched field outside the projection would be silently kept
    by a narrow query. The ``bad`` predicate therefore references every
    data column via a constant-false ``xxhash64(*cols) < LONG_MIN`` term:
    it forces the scan's required schema to the full document schema
    (malformed-ness is projection-independent; docs ∪ quarantine always
    exactly partitions the input) at the cost of parsing all columns even
    for narrow queries — for JSON that trade is right, because line
    tokenization dominates and the per-column parse saving is small
    relative to silently-shifting row sets. Parquet remains the prunable
    fast path; this source is the ingest/quarantine boundary."""
    raw = (
        spark.read.schema(_read_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    data_cols = [F.col(f.name) for f in DOCUMENTS_SCHEMA.fields]
    # Constant-false, but Catalyst cannot fold it (non-foldable children,
    # no range analysis on hash outputs) — it survives to the scan filter
    # and pins the JSON required schema to every data column.
    # SPARK-VERSION DEPENDENCE (r5 ADVICE): this relies on no optimizer
    # rule ever folding `xxhash64(...) < LONG_MIN` to false. Spark 4.1 has
    # no such rule; if a future version grows extreme-value folding, the
    # projection-dependent malformed-row leak would silently reopen. The
    # regression test (test_json_source.py narrow-projection case) is the
    # guard — if it starts failing on a Spark upgrade, replace the pin by
    # referencing all columns in the quarantine-side to_json projection.
    parse_pin = F.xxhash64(*data_cols) < F.lit(-(2**63))
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("doc_id").isNull() | parse_pin
    docs = raw.filter(~bad).select(*[f.name for f in DOCUMENTS_SCHEMA.fields])
    quarantine = raw.filter(bad).select(
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*[F.col(f.name) for f in DOCUMENTS_SCHEMA.fields])),
        ).alias("raw")
    )
    return docs, quarantine


def write_documents_json(docs: DataFrame, path: str, partitions: int | None = None) -> None:
    """JSON-lines sink (round-trips through read_documents_json)."""
    if partitions:
        docs = docs.repartition(partitions)
    docs.write.mode("overwrite").json(path)
