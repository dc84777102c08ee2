from .text import (  # noqa: F401
    collapse_ws,
    content_fingerprint,
    langid_scores,
    ngram_shingles,
    quality_features,
    token_count,
    tokens,
)
from .vector import cosine_similarity, dot_product, l2_norm  # noqa: F401
