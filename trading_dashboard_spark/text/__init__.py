from .analysis import (  # noqa: F401
    tokenize,
    token_count,
    quality_features,
    language_id,
    fingerprint,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    shingles,
    minhash_signature,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_hamming_pairs,
)
from .sentiment import sentiment_score  # noqa: F401
