from .knn import knn_exact, knn_batch, similarity_self_join  # noqa: F401
