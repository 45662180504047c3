"""JSON-lines source (north-star extension — the reference ingests only
CSV; real training-data pipelines are mostly JSONL in object storage).

Same discipline as the parquet/CSV loaders: explicit schema (never
``inferSchema`` at scale — one pass saved, stable types), non-text fields
tolerated and pruned, malformed lines quarantined instead of failing the
job (PERMISSIVE + ``_corrupt_record``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long, "
    "_corrupt_record string"
)


def load_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL file; malformed rows are dropped (counted
    by the caller via the `_corrupt_record` split if needed)."""
    df = (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
