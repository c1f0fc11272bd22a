"""lexis_minhash_spark — a from-scratch PySpark-native near-duplicate
detection & clustering engine with the query/data-processing capabilities of
kritoke/lexis-minhash (MinHash + LSH), extended with SimHash, suffix-array
exact-substring matching, and training-data-pipeline operators (dedup
families, similarity search, text analysis, audio plumbing).

Architecture: DataFrame-first. Hash kernels are vectorized NumPy inside
Arrow-batched pandas UDFs (kernels.py); everything relational (banding
joins, pair dedup, verification, clustering, dedup extras) is declarative
DataFrame/SQL so Catalyst/AQE pick physical plans that survive 100 TB.
"""

from lexis_minhash_spark.config import DEFAULT_CONFIG, EngineConfig
from lexis_minhash_spark import api, kernels

__all__ = ["DEFAULT_CONFIG", "EngineConfig", "api", "kernels"]
__version__ = "0.1.0"
