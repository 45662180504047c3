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


#: token → (bucket, ±1) memo, per Python worker process. Natural-language
#: batches repeat tokens heavily, so this turns ~1 md5/token-occurrence
#: into ~1 md5/distinct-token — ~10× on the embed stage — with identical
#: output (the hash of a token is pure).
_TOKEN_MEMO: dict[tuple[str, int], tuple[int, int]] = {}


def _token_bucket(tok: str, dim: int) -> tuple[int, int]:
    key = (tok, dim)
    hit = _TOKEN_MEMO.get(key)
    if hit is None:
        h = hashlib.md5(tok.encode("utf-8")).digest()
        hit = (int.from_bytes(h[:4], "little") % dim, 1 if h[4] & 1 else -1)
        if len(_TOKEN_MEMO) < 4_000_000:  # bound worker memory
            _TOKEN_MEMO[key] = hit
    return hit


def _hash_embed_batch(texts: pd.Series, dim: int) -> pd.Series:
    """Feature-hash a batch of texts into unit-norm float32 vectors.

    Accumulation is exact (±1 counts in int64, so fold order is
    irrelevant), then one vectorized normalize over the whole batch —
    bit-identical to the per-row reference loop but numpy-speed."""
    n = len(texts)
    mat = np.zeros((n, dim), dtype=np.int64)
    for row, text in enumerate(texts):
        if not text:
            continue
        for tok in str(text).lower().split():
            idx, sign = _token_bucket(tok, dim)
            mat[row, idx] += sign
    vecs = mat.astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    np.divide(vecs, norms, out=vecs, where=norms > 0)
    return pd.Series(list(vecs.astype(np.float32)))


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
    installed; the UDF itself loads the model lazily per executor.

    Environment debt (carried since round 3, install re-attempted and
    still blocked 2026-08-16 / round 14: the container's pip index is
    unreachable — outbound DNS fails on every retry): the library cannot be
    installed here, so this backend is contract-tested via an injected
    fake (tests/test_embedding_contract.py) and the one real-model
    smoke test stays skipped. The code path is complete — if the
    environment ever unblocks, that skip flipping to pass is the only
    remaining step (SURVEY §2 F7)."""
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
