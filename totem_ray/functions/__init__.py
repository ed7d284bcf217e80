from totem_ray.functions.text import (  # noqa: F401
    token_stats,
    quality_scores,
    lang_id,
    doc_fingerprints,
)
from totem_ray.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_candidates,
    minhash_dedup_groups,
    simhash_signatures,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
    embedding_near_dup_pairs,
)
from totem_ray.functions.similarity import (  # noqa: F401
    knn_brute_force,
    knn_ivf,
)
from totem_ray.functions.windows import (  # noqa: F401
    tumbling_window,
    session_windows,
    as_of_join,
)
