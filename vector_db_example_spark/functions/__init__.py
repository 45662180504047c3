from .vector import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_distance_sq,
    l2_norm,
    score_from_distance,
)
