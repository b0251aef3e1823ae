from vearch_spark.functions.distance import (
    array_lit,
    cosine_similarity,
    hamming_distance,
    inner_product,
    l2_distance,
    l2_normalize,
    l2_squared,
    score_expr,
)

__all__ = [
    "array_lit",
    "cosine_similarity",
    "hamming_distance",
    "inner_product",
    "l2_distance",
    "l2_normalize",
    "l2_squared",
    "score_expr",
]
