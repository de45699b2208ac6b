"""Declared query plans.

Each module registers QuerySpecs into the central registry; importing this
package loads them all. ``registry.all_queries()`` is the single source the
driver entry point (``__spark_entry__.py``) exposes.
"""

# Registry *order* is the order external harnesses sample queries in (a
# prefix-window harness certifies the first entries first); names are
# append-only but order is a presentation concern, set explicitly by the
# promote() call below. Module import order no longer encodes the window.
from . import extras  # noqa: F401
from . import sequences  # noqa: F401
from . import pipeline  # noqa: F401
from . import text_analysis  # noqa: F401
from . import similarity  # noqa: F401
from . import windows  # noqa: F401
from . import dedup  # noqa: F401
from . import temporal_plans  # noqa: F401
from . import chunking  # noqa: F401
from . import bloom  # noqa: F401
from . import generator_plans  # noqa: F401
from . import analytics  # noqa: F401
from . import relational  # noqa: F401
from . import layout  # noqa: F401
from . import versioning  # noqa: F401
from . import vocab  # noqa: F401
from . import curriculum  # noqa: F401
from . import rag  # noqa: F401
from . import scale_extras  # noqa: F401
from . import features  # noqa: F401
from . import supervision  # noqa: F401
from .registry import QuerySpec, all_queries, get_query, promote  # noqa: F401

# Round 7 rotation: the r6 window certified 50/50, leaving exactly 38
# hash-oracle queries with no driver green across r1–r6 (the 29 r5-era
# stragglers + the 8 new r6 queries + dedup_embedding_capped). All 38
# lead this window, followed by 12 re-certs of long-stable queries to
# fill the 50. Both rows-only-by-design queries (sim_kmeans_assign,
# mm_features) stay past position 50 — a prefix-window harness treats
# oracle-less entries as failures (r5 lesson). If this window certifies,
# EVERY oracle-checkable registry query has a driver green and the
# rotation machinery can retire to re-cert duty. The arithmetic is no
# longer hand-counted: tests/test_rotation.py recomputes never-green =
# registry − union(CORRECTNESS_r01..rN) and asserts this prefix covers
# it, so a miscount fails CI instead of stranding a query.
promote([
    # --- the 38 never-driver-certified hash-oracle queries ---
    # text_analysis (8)
    "text_lang_confusion",
    "text_bigram_lm",
    "text_trigram_backoff_lm",
    "text_langid_ngram",
    "text_domain_mix",
    "text_decontaminate_spans",
    "text_zipf_check",
    "text_novelty_curve",
    # similarity / ANN (7)
    "sim_pq_rerank",
    "sim_ivfpq_residual",
    "sim_matryoshka_recall",
    "sim_ivf_balance",
    "dedup_embedding_capped",
    "dedup_semantic_pairs",
    "dedup_semantic",
    # semantic / graph dedup (6)
    "dedup_semantic_kmeans",
    "dedup_components_stats",
    "graph_pagerank_dups",
    "graph_triangles",
    "dedup_minhash_accuracy",
    "dedup_cross_lingual",
    # LSH cap/sample + composed keepers (4)
    "dedup_lsh_sampled",
    "dedup_keepers_capped",
    "dedup_keepers",
    "dedup_incremental",
    # sampling (5)
    "sample_weighted",
    "sample_hard_negatives",
    "sample_negatives",
    "sample_split_leakage",
    "pipeline_triplets",
    # misc r5/r6 tails (8)
    "dedup_cdc_chunks",
    "feat_minmax_normalize",
    "rag_eval_metrics",
    "mm_frames_checked",
    "seq_attribution",
    "layout_hilbert_ab",
    "agg_kmv_setops",
    "agg_kmv_grouped",
    # --- 12 re-certs of long-stable driver greens ---
    "gen_records",
    "gen_rate_law",
    "gen_topic_names",
    "dedup_exact",
    "dedup_lsh_capped",
    "win_session_30m",
    "agg_collect_list",
    "scalar_json_construct",
    "scalar_null_battery",
    "grouped_event_gaps",
    "setop_intersect_union",
    "pipeline_end_to_end",
])
