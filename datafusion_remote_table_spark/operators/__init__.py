from .clustering import cluster_balanced_sample, kmeans_assign, pca_top_component  # noqa: F401
from .corpus import (  # noqa: F401
    boilerplate_stats,
    ngram_decontaminate,
    pack_sequences,
    substring_clip,
    substring_span_stats,
)
from .dedup import containment_pairs, exact_dedup, minhash_lsh_pairs, simhash_signatures  # noqa: F401
from .similarity import adaptive_lsh_buckets, brute_force_topk, lsh_buckets  # noqa: F401
from .windows import hourly_anomaly, markov_transitions, sessionize, tumbling_window  # noqa: F401
from .maintenance import cdc_changelog, merge_upsert  # noqa: F401
from .governance import dq_audit, kanonymity, psi_drift, referential_integrity  # noqa: F401
from .sketches import countmin_estimate, countmin_sketch, hll_distinct  # noqa: F401
