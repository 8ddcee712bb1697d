"""LLM-training-data pipeline operators (BASELINE.json north star).

No counterpart in the reference — these extend SURVEY.md §2 with the
operations a 100 TB text/embedding corpus pipeline needs: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal binary columns.
"""

from turbine_maintenance_etl_spark.llm.text import (  # noqa: F401
    add_language_scores,
    add_quality_signals,
    add_tokens,
    fingerprint,
)
from turbine_maintenance_etl_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    exact_dedup_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    duplicated_span_stats,
    ngram_jaccard_pairs,
    remove_duplicated_spans,
    shingles,
    simhash,
)
from turbine_maintenance_etl_spark.llm.quality import (  # noqa: F401
    bloom_decontamination,
    decontamination_scores,
    redact_pii,
    repetition_signals,
    segment_repetition_signals,
)
from turbine_maintenance_etl_spark.llm.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_expr,
    fit_pq,
    lsh_bucketed_topk,
    pq_decode,
    pq_encode,
    pq_topk,
    random_hyperplanes,
    semantic_dedup,
)
from turbine_maintenance_etl_spark.llm.embed import (  # noqa: F401
    embed_text,
    fit_pca,
    l2_normalize,
    pca_project,
)
from turbine_maintenance_etl_spark.llm.lm import (  # noqa: F401
    perplexity_scores,
    sb3_perplexity_scores,
)
from turbine_maintenance_etl_spark.llm.text import (  # noqa: F401
    corpus_report,
    normalize_text_expr,
    normalized_dedup,
)
from turbine_maintenance_etl_spark.llm.similarity import ivfpq_topk  # noqa: F401
from turbine_maintenance_etl_spark.llm.multimodal import (  # noqa: F401
    extract_audio_features,
    extract_image_features,
    resample_audio,
    resize_images,
)
from turbine_maintenance_etl_spark.llm.curation import (  # noqa: F401
    curate_corpus,
    curate_corpus_v2,
    curate_corpus_v3,
)
