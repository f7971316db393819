from lsh_spark.functions.text import tokens_col, shingles_col
from lsh_spark.functions.hashing import portable_hash64, minhash_params

__all__ = ["tokens_col", "shingles_col", "portable_hash64", "minhash_params"]
