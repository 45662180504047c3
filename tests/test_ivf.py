"""IVF index correctness: the nprobe=nlist identity, recall vs exact,
expression-based cell assignment parity with MLlib, and the append path
(SURVEY.md §5.2 and hard parts (a))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ivf(spark, tmp_path_factory):
    from vector_db_example_spark.index.ivf import build_ivf_index
    from vector_db_example_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    return build_ivf_index(emb, path=path, nlist=16)


def _exact_topk(spark, query_vec, k=10):
    from vector_db_example_spark.operators.knn import knn_exact
    from vector_db_example_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    return knn_exact(emb, query_vec, k=k, score_threshold=None)


def _qvec(spark, vec_id):
    from vector_db_example_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb.filter(F.col("vec_id") == vec_id).head().embedding


def test_nprobe_equals_nlist_is_exact(spark, ivf):
    from vector_db_example_spark.index.ivf import ivf_search

    for qid in (0, 11, 42):
        q = _qvec(spark, qid)
        exact = [(r.vec_id, round(r.distance, 9)) for r in _exact_topk(spark, q).collect()]
        approx = [
            (r.vec_id, round(r.distance, 9))
            for r in ivf_search(spark, ivf, q, k=10, nprobe=16).collect()
        ]
        assert exact == approx, f"query {qid}: IVF(nprobe=nlist) != exact"


def test_pruned_probe_recall(spark, ivf):
    from vector_db_example_spark.index.ivf import ivf_search

    recalls = []
    for qid in (0, 11, 42, 99, 123):
        q = _qvec(spark, qid)
        exact_ids = {r.vec_id for r in _exact_topk(spark, q).collect()}
        got = {r.vec_id for r in ivf_search(spark, ivf, q, k=10, nprobe=4).collect()}
        recalls.append(len(exact_ids & got) / len(exact_ids))
    avg = sum(recalls) / len(recalls)
    # 4/16 cells scanned; random unit vectors cluster weakly, so demand a
    # floor well above the 25% scan fraction but below perfect.
    assert avg >= 0.5, f"recall@10 with nprobe=4/16 too low: {recalls}"


def test_assign_cells_matches_kmeans(spark, ivf):
    """The append-path argmin expression must reproduce MLlib's own
    nearest-centroid prediction on the indexed corpus."""
    from vector_db_example_spark.index.ivf import assign_cells

    indexed = spark.read.parquet(ivf.path)
    mismatch = (
        indexed.withColumn("assigned", assign_cells(ivf, F.col("embedding")))
        .filter(F.col("assigned") != F.col("cell_id"))
        .count()
    )
    assert mismatch == 0


def test_append_visible_in_next_search(spark, ivf):
    """S6/3.3 semantics: an appended vector (nearest-centroid assignment,
    no refit) is found by the next search."""
    from vector_db_example_spark.index.ivf import assign_cells, ivf_search

    q = _qvec(spark, 7)
    new_row = spark.createDataFrame(
        [(999999, [float(x) for x in q], 0)],
        "vec_id long, embedding array<float>, label int",
    ).withColumn("cell_id", assign_cells(ivf, F.col("embedding")))
    new_row.write.partitionBy("cell_id").mode("append").parquet(ivf.path)
    hits = ivf_search(spark, ivf, q, k=2, nprobe=16).collect()
    assert {r.vec_id for r in hits} == {7, 999999}  # both at distance 0
