from corral_spark.operators.dedup import (
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash64,
    simhash_pairs,
)
from corral_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk
from corral_spark.operators.textanalysis import (
    doc_fingerprint,
    lang_id,
    text_stats,
    token_count_bpe,
)

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_pairs",
    "cosine_topk",
    "ivf_assign",
    "ivf_topk",
    "doc_fingerprint",
    "lang_id",
    "text_stats",
    "token_count_bpe",
]
