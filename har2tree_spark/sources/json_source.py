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

    TWO-PASS read, not one checkpointed PERMISSIVE read: the clean pass
    uses DROPMALFORMED and streams straight into downstream plans (lazy,
    prunable, no materialization — at 100 TB an eager checkpoint of the
    raw input doubles ingest I/O before the first filter runs); the
    quarantine pass re-reads with PERMISSIVE + the corrupt column and is
    only ever executed if something consumes it. The corrupt-column
    filter is legal here without materialization because the quarantine
    projection references every data column (to_json of the full struct),
    so Spark's JSON column pruning cannot reduce the parse to the corrupt
    column alone."""
    docs = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
        .filter(F.col("doc_id").isNotNull())
    )
    raw = (
        spark.read.schema(_read_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("doc_id").isNull()
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
