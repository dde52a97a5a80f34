"""Training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — the capabilities a 100 TB corpus pipeline
needs on top of the CDC core. Each operator has an oracle-checked query in
``airbyte_module_spark.queries`` and unit tests in ``tests/``."""

from airbyte_module_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
