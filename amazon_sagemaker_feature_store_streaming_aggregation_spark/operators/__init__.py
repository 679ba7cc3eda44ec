from .window_agg import (  # noqa: F401
    trailing_window_features,
    trailing_window_features_bucketed,
    trailing_window_features_exact,
    agg_features_query,
)
from .asof_join import asof_join  # noqa: F401
from .embedding import embed_text_hashed  # noqa: F401
from .quality_clf import (  # noqa: F401
    classify_quality,
    model_weights_sql,
    quality_training_fixture,
    train_quality_classifier,
    train_quality_classifier_spark,
)
from .incremental import delta_scoped_features  # noqa: F401
from .range_join import range_join  # noqa: F401
from .salted_join import salted_join  # noqa: F401
from .rollup import time_rollup  # noqa: F401
from .sampling import (  # noqa: F401
    deterministic_sample,
    stratified_sample,
    temperature_mixture,
    token_budget_mix,
    token_budget_mix_epochs,
    weighted_sample,
)
from .sessionize import session_stats, sessionize  # noqa: F401
from .ratios import with_ratio_features, with_guarded_inference_ratios  # noqa: F401
from .latest_per_key import latest_per_key  # noqa: F401
from .dedup import (  # noqa: F401
    band_rows,
    build_dedup_bloom,
    build_lsh_band_index,
    build_text_hash_index,
    build_text_hash_index_bucketed,
    clusters_append,
    clusters_delta,
    connected_components,
    contamination_overlap,
    dedup_append,
    dedup_append_bloom,
    dedup_append_bucketed,
    dedup_edit_distance,
    dedup_exact,
    dedup_url_canonical,
    hamming_near_dup_edges,
    hamming_near_dup_pairs,
    lsh_append_candidates,
    lsh_candidate_pairs,
    lsh_near_dup_edges,
    minhash_signatures,
    jaccard_verify_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash,
    source_overlap_matrix,
)
from .similarity import (  # noqa: F401
    ann_srp_topk,
    ann_topk_batched,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_centroids,
    hard_negatives,
    ivf_topk,
    ivf_topk_batched,
    ivf_pq_topk_batched,
    label_centroids,
    pq_codebooks,
    pq_encode,
    pq_topk,
    semantic_dedup,
    semantic_dedup_pairs,
    srp_signatures,
    train_ivf_centroids,
)
from .lm import (  # noqa: F401
    lm3_fit,
    lm3_transition_scores,
    lm5_fit,
    lm5_transition_scores,
    lm_fit,
    lm_transition_scores,
)
from .multimodal import (  # noqa: F401
    audio_fingerprint,
    audio_near_dup_pairs,
    extract_features,
    image_near_dup_pairs,
    perceptual_hashes,
    resize_plan,
    sample_frames,
    synth_media,
    video_fingerprint,
    video_frame_hashes,
    video_near_dup_pairs,
)
from .retrieval import (  # noqa: F401
    bm25_topk,
    rrf_fuse,
)
from .tfidf import (  # noqa: F401
    build_vocabulary,
    pmi_collocations,
    tfidf_top_terms,
    token_frequency_spectrum,
    vocab_coverage,
)
from .training_data import (  # noqa: F401
    cap_per_source,
    chunk_documents,
    global_shuffle,
    leakage_safe_split,
    pack_context_windows,
    remove_boilerplate_lines,
    write_training_shards,
)
