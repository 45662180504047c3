"""Vector-collection catalog: DDL + stats (SURVEY.md §2.1 S8–S9) and the
insert paths (S5–S6).

A *collection* is a parquet-backed table with the reference's fixed
schema (id / chapter / content / vector<float, dim>; reference DDL at
/root/reference/src/app.py:96-117). Operations:

* create (idempotent unless force_recreate) / exists / drop
* describe + stats — with the TRUE row count (the reference's stats
  method returns len() of a one-row result set, a bug SURVEY.md §2.1 S9
  says not to replicate)
* insert — batched embed+append (S5); engine-assigned ids (auto_id
  semantics: callers never supply ids, src/app.py:221-227)

Storage is plain parquet under a root directory — at cluster scale the
same API would sit over a catalog table / object-store prefix; every
reader goes through ``spark.read.parquet`` so pruning and pushdown hold.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import fsio

DEFAULT_DIM = 384  # reference DIMENSION, src/app.py:22


def collection_schema(dim: int = DEFAULT_DIM) -> T.StructType:
    """Explicit fixed schema (enable_dynamic_field=False equivalent —
    schema-on-write, never inferSchema; src/app.py:96-103)."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("chapter", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("vector", T.ArrayType(T.FloatType()), True),
        ]
    )


@dataclass
class CollectionCatalog:
    """Filesystem-rooted collection catalog."""

    spark: SparkSession
    root: str

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    # -- S8: DDL ---------------------------------------------------------

    def exists(self, name: str) -> bool:
        # fsio (Hadoop FS), not os.path: the catalog root can be an
        # object-store prefix, exactly as the class docstring promises.
        return fsio.exists(f"{self._path(name)}/_SUCCESS", self.spark) or any(
            f.endswith(".parquet")
            for f in fsio.list_names(self._path(name), self.spark)
        )

    def drop(self, name: str) -> bool:
        return fsio.delete(self._path(name), spark=self.spark)

    def create(
        self, name: str, dim: int = DEFAULT_DIM, force_recreate: bool = False
    ) -> bool:
        """Idempotent create (reference initialize semantics,
        src/app.py:39-59, 85-91): an existing collection is reused unless
        force_recreate. Returns True if a new collection was created."""
        if self.exists(name):
            if not force_recreate:
                return False
            self.drop(name)
        empty = self.spark.createDataFrame([], collection_schema(dim))
        empty.write.mode("overwrite").parquet(self._path(name))
        return True

    # -- reads -----------------------------------------------------------

    def read(self, name: str) -> DataFrame:
        return self.spark.read.schema(collection_schema()).parquet(self._path(name))

    def describe(self, name: str) -> dict:
        df = self.read(name)
        return {
            "name": name,
            "fields": [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in df.schema.fields
            ],
            "location": self._path(name),
        }

    def stats(self, name: str) -> dict:
        """S9 — with the true count(*), not the reference's row-count-of-
        the-count-result bug (src/app.py:485)."""
        df = self.read(name)
        return {"name": name, "row_count": df.count(), **self.describe(name)}

    # -- S5/S6: inserts --------------------------------------------------

    def insert(
        self,
        name: str,
        rows: DataFrame,
        embedder: Column | None = None,
        text_col: str = "content",
    ) -> int:
        """Batched insert (S5): assign engine ids, optionally embed, and
        append. Returns the inserted count (reference returns
        len(insert_result['ids']), src/app.py:231).

        Id assignment: ``max(existing id) + 1 + monotonically_increasing_id()``
        — unique within the batch (mono ids) and disjoint from existing
        rows (offset), with no global shuffle. Ids are sparse, which
        auto_id explicitly permits (engine-assigned, opaque).

        The batch is materialized ONCE (localCheckpoint) before the write:
        mono ids are non-deterministic, so counting and writing two
        separate evaluations could disagree (and would run the embed UDF
        twice). Single-writer assumption: ``base`` is read without
        coordination, so two concurrent inserts into the same collection
        can collide — the catalog models the reference's single-process
        client (src/app.py:205-238); a multi-writer deployment needs a
        transactional table format (e.g. an Iceberg/Delta sink) or
        content-derived ids.
        """
        existing = self.read(name)
        base = (existing.agg(F.max("id")).head()[0] or 0) + 1
        out = rows
        if embedder is not None and "vector" not in rows.columns:
            out = out.withColumn("vector", embedder)
        if "vector" not in out.columns:
            out = out.withColumn(
                "vector", F.lit(None).cast(T.ArrayType(T.FloatType()))
            )
        out = (
            out.withColumn(
                "id", (F.monotonically_increasing_id() + F.lit(base)).cast("long")
            )
            .select("id", "chapter", "content", "vector")
            .localCheckpoint(eager=True)
        )
        n = out.count()
        out.write.mode("append").parquet(self._path(name))
        return n

    def insert_one(
        self,
        name: str,
        chapter: str,
        content: str,
        embedder: Column | None = None,
        min_content_length: int = 10,
    ) -> tuple[bool, str]:
        """S6: validated single-row insert (reference insert_knowledge,
        src/app.py:409-436): non-empty check, F1 preprocessing, P4 length
        check, then the S5 path with one row."""
        from .functions.text import clean_content

        if not chapter or not chapter.strip() or not content or not content.strip():
            return False, "chapter and content must be non-empty"
        row = self.spark.createDataFrame(
            [(chapter.strip(), content)], "chapter string, content string"
        ).withColumn("content", clean_content(F.col("content")))
        row = row.filter(F.length("content") >= min_content_length)
        if row.limit(1).count() == 0:
            return False, f"content shorter than {min_content_length} after cleaning"
        n = self.insert(name, row, embedder=embedder)
        return n == 1, f"inserted {n} row"
