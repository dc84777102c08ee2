from .clustering import cluster_balanced_sample, kmeans_assign  # noqa: F401
from .corpus import boilerplate_stats, ngram_decontaminate, pack_sequences  # noqa: F401
from .dedup import exact_dedup, minhash_lsh_pairs, simhash_signatures  # noqa: F401
from .similarity import brute_force_topk, lsh_buckets  # noqa: F401
from .windows import sessionize, tumbling_window  # noqa: F401
