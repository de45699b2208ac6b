"""Reusable DataFrame operators (dedup, similarity, top-k, multimodal).

Public surface re-exported for discoverability; each module's docstring
carries the scale-design rationale.
"""

from .bucketing import bucketed_join, plan_has_exchange, write_bucketed  # noqa: F401
from .dedup import (  # noqa: F401
    doc_shingles,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from .grouped import event_gaps  # noqa: F401
from .ivf_index import build_ivf_index, probe_ivf_index, query_vectors  # noqa: F401
from .multimodal import (  # noqa: F401
    extract_features,
    media_fingerprint,
    sample_frames,
    synth_media,
)
from .similarity import (  # noqa: F401
    assign_clusters,
    brute_force_topk,
    embedding_dup_pairs,
    ivf_topk,
    kmeans_iterate,
    lsh_buckets,
)
from .skew import salted_agg, salted_count, salted_join  # noqa: F401
