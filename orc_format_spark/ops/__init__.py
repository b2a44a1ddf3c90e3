"""Large-scale training-data pipeline operators (first-class components
alongside the codec engine): deduplication, similarity search, text
analysis, and multimodal column plumbing. All Spark-first: built-in
DataFrame ops where expressible, Arrow-batched pandas UDFs otherwise —
never per-row Python.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
