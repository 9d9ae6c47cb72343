"""Operator library: composite relational operators plus the
LLM-data-pipeline extensions (dedup, similarity, text, multimodal).

Submodules are imported eagerly so ``pipes_spark.operators.<mod>`` is
available after ``import pipes_spark.operators``.
"""

from . import dedup, multimodal, relational, scale, similarity, text, udfs

__all__ = ["dedup", "multimodal", "relational", "scale", "similarity", "text", "udfs"]
