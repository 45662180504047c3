"""F7 real-model path contract test (VERDICT r1 item 5).

sentence-transformers is not installable in this container, so the
executor-side model lifecycle of ``sentence_transformer_embedder`` —
import gate, lazy per-worker load, model cache across Arrow batches,
384-dim float32 output — is exercised against a generated FAKE
``sentence_transformers`` module shipped to the Python workers with
``addPyFile``. The fake's ``SentenceTransformer`` records every
instantiation in a marker directory, so the cache contract ("load once
per worker process, however many batches it embeds") is observable.
"""

from __future__ import annotations

import importlib
import os
import sys
import textwrap

import pytest
from pyspark.sql import functions as F


FAKE_SRC = """
import os
import uuid

import numpy as np

__version__ = "0.0-fake"


class SentenceTransformer:
    DIM = 384

    def __init__(self, model_name):
        self.model_name = model_name
        # One marker file per instantiation, named by worker pid: the
        # executor cache contract is "<= 1 instantiation per pid".
        os.makedirs({log_dir!r}, exist_ok=True)
        marker = os.path.join(
            {log_dir!r}, f"load_pid{{os.getpid()}}_{{uuid.uuid4().hex}}"
        )
        with open(marker, "w") as fh:
            fh.write(model_name)

    def encode(self, texts):
        # Deterministic stand-in: row i -> full(384, len(text)/100).
        return [
            np.full(self.DIM, len(t) / 100.0, dtype=np.float32) for t in texts
        ]
"""


def test_sentence_transformer_path_loads_once_per_worker(spark, tmp_path):
    from vector_db_example_spark.functions.embedding import (
        sentence_transformer_embedder,
    )

    log_dir = str(tmp_path / "loads")
    mod_dir = tmp_path / "fakemod"
    mod_dir.mkdir()
    mod_file = mod_dir / "sentence_transformers.py"
    mod_file.write_text(textwrap.dedent(FAKE_SRC.format(log_dir=log_dir)))

    # Driver side: satisfy the find_spec import gate. Worker side: ship
    # the module file (addPyFile puts it on every worker's sys.path).
    sys.path.insert(0, str(mod_dir))
    importlib.invalidate_caches()
    spark.sparkContext.addPyFile(str(mod_file))
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        embed = sentence_transformer_embedder("fake-MiniLM")
        # Many small Arrow batches through few partitions: the cache, not
        # the batching, must bound model loads.
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
        df = (
            spark.range(120)
            .repartition(2)
            .withColumn("text", F.concat(F.lit("doc "), F.col("id")))
            .withColumn("embedding", embed(F.col("text")))
        )
        rows = df.select("text", "embedding").collect()

        assert len(rows) == 120
        for r in rows:
            assert len(r.embedding) == 384
            assert r.embedding[0] == pytest.approx(len(r.text) / 100.0, abs=1e-6)

        loads = os.listdir(log_dir)
        pids = {name.split("_")[1] for name in loads}
        # >=1 load happened, and no worker process loaded twice despite
        # ~12 batches: the per-process cache held.
        assert loads, "model never instantiated"
        assert len(loads) == len(pids), f"a worker re-loaded the model: {loads}"
    finally:
        sys.path.remove(str(mod_dir))
        sys.modules.pop("sentence_transformers", None)
        importlib.invalidate_caches()
        if old_batch is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)


def test_missing_library_raises_at_construction():
    from vector_db_example_spark.functions.embedding import (
        sentence_transformer_embedder,
    )

    if importlib.util.find_spec("sentence_transformers") is not None:
        pytest.skip("library actually installed")
    with pytest.raises(ImportError):
        sentence_transformer_embedder()
