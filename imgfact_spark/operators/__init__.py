from imgfact_spark.operators.topk import topk_per_group  # noqa: F401
from imgfact_spark.operators.salted import salted_count  # noqa: F401
from imgfact_spark.operators.zip_join import zip_join, with_position  # noqa: F401
from imgfact_spark.operators.connected_components import connected_components  # noqa: F401
from imgfact_spark.operators.balance import oversample_balance  # noqa: F401
from imgfact_spark.operators.messy_swap import messy_swap  # noqa: F401
from imgfact_spark.operators.dedup import (  # noqa: F401
    contamination_check,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_dup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    ngram_topk,
    simhash64,
    simhash_dup_pairs,
)
from imgfact_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_neardup_pairs,
    hyperplane_signatures,
    ivf_topk,
    lsh_topk,
)
from imgfact_spark.operators.clustering import cluster_representatives  # noqa: F401
from imgfact_spark.operators.retrieval import bm25_topk  # noqa: F401
from imgfact_spark.operators.sampling import (  # noqa: F401
    sample_global,
    sample_stratified,
    sample_weighted,
    seeded_key,
)
