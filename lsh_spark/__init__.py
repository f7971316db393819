"""lsh_spark — a PySpark-native near-duplicate detection & clustering engine.

From-scratch re-expression of the query/data-processing capabilities of the
reference LSH retrieval system (``/root/reference``, HosanaUFRRJ2014/lsh):
k-shingling, permutation-family MinHash signatures, banded LSH bucketing,
Jaccard verification, threshold gating and evaluation — re-targeted from
pitch-vector retrieval to near-duplicate detection over multi-turn
conversation transcripts, and built Spark-first (DataFrame/Catalyst/Arrow),
NOT as a port of the reference's eager single-node NumPy engine.

Reference semantics are cited per-operator as ``file:line`` of the reference
repo (see SURVEY.md §2 for the full inventory).
"""

from lsh_spark.config import DedupConfig
from lsh_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
