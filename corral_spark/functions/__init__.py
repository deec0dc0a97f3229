from corral_spark.functions.text import tokenize, substr_prefix
from corral_spark.functions.vectors import dot, l2_norm, cosine_sim

__all__ = ["tokenize", "substr_prefix", "dot", "l2_norm", "cosine_sim"]
