from imgfact_spark.functions.text import (  # noqa: F401
    norm_space,
    norm_underscore,
    strip_parenthetical,
    canonical_entity,
    token_count,
    quality_score,
    lang_id,
    doc_fingerprint,
)
from imgfact_spark.functions.vectors import (  # noqa: F401
    cosine_sim,
    dot_product,
    l2_norm,
)
from imgfact_spark.functions.scoring import det_score_col, det_score_py  # noqa: F401
