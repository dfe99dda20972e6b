from .knn import cosine_sim, knn_to_probe, knn_all_pairs, embedding_norms  # noqa: F401
from .lsh import random_hyperplane_buckets, lsh_knn  # noqa: F401
