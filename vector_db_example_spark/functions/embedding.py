"""F7 — the embedding surface: text → fixed-dim float vector.

This is the engine's only model-backed function (reference: a
SentenceTransformer loaded once and applied in batches,
/root/reference/src/app.py:74, 219, 246). Two backends behind one
``pandas_udf`` surface:

* ``hashing_embedder``  — deterministic feature-hashing embedder (the
  test/correctness backend): token → md5 → (index, sign) → accumulate →
  L2-normalize. Stable across machines, versions and runs, which is what
  the correctness corpus needs (SURVEY.md §5 "hard parts" (b)).
* ``sentence_transformer_embedder`` — the real model, gated behind an
  import-try (the library is not in this container); loaded once per
  executor process and cached, Arrow-batched.

Both are Arrow-batched pandas UDFs — the model/numpy work is amortized
over whole record batches, the JVM↔Python boundary is columnar, and at
cluster scale each executor embeds its partitions independently (this is
the reference's driver-side batch loop turned into an executor-parallel
map; SURVEY.md §3.2)."""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 384  # reference DIMENSION (src/app.py:22)


def _hash_embed_batch(texts: pd.Series, dim: int) -> pd.Series:
    """Feature-hash a batch of texts into unit-norm float32 vectors."""
    out = []
    for text in texts:
        vec = np.zeros(dim, dtype=np.float64)
        if text:
            for tok in str(text).lower().split():
                h = hashlib.md5(tok.encode("utf-8")).digest()
                idx = int.from_bytes(h[:4], "little") % dim
                sign = 1.0 if h[4] & 1 else -1.0
                vec[idx] += sign
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec /= norm
        out.append(vec.astype(np.float32))
    return pd.Series(out)


def hashing_embedder(dim: int = DEFAULT_DIM) -> Callable:
    """Deterministic hashing embedder as an Arrow-batched pandas UDF
    returning array<float>."""

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        return _hash_embed_batch(texts, dim)

    return embed


def hash_embed_one(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side single-text embedding (for query vectors) — identical
    math to the UDF path."""
    return [float(x) for x in _hash_embed_batch(pd.Series([text]), dim)[0]]


#: Executor-side model cache: one model instance per Python worker
#: process, keyed by model name (reference loads the model once at init;
#: here "once" means once per executor, SURVEY.md §5 hard part (d)).
_MODEL_CACHE: dict[str, object] = {}


def sentence_transformer_embedder(
    model_name: str = "paraphrase-multilingual-MiniLM-L12-v2",
) -> Callable:
    """Real-model embedder (reference model, src/app.py:74). Raises
    ImportError at *call construction* if sentence-transformers is not
    installed; the UDF itself loads the model lazily per executor."""
    import importlib

    if importlib.util.find_spec("sentence_transformers") is None:
        raise ImportError(
            "sentence-transformers is not installed in this environment; "
            "use hashing_embedder() for deterministic embeddings"
        )

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        from sentence_transformers import SentenceTransformer

        model = _MODEL_CACHE.get(model_name)
        if model is None:
            model = SentenceTransformer(model_name)
            _MODEL_CACHE[model_name] = model
        vecs = model.encode([str(t) if t else "" for t in texts])
        return pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

    return embed
