"""Large-scale training-data pipeline operators.

Beyond the reference's own operator set (SURVEY §2), a 100 TB-scale
log/transcript engine needs the data-curation ops a training pipeline
runs over the same tables: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard), embedding similarity search, text analysis
(language-ID, quality scoring, token counting, fingerprinting) and
multimodal column plumbing. All are pure DataFrame compositions —
shuffle-conscious, broadcast where applicable, no Python in hot paths
except the clearly-marked multimodal decode stubs.
"""

from rsyslog_spark.dataops import dedup, multimodal, similarity, textstats

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
