"""Operator library: composite relational operators plus the
LLM-data-pipeline extensions (dedup, similarity, text, multimodal).

Submodules are imported eagerly so ``pipes_spark.operators.<mod>`` is
available after ``import pipes_spark.operators``.
"""

from . import (
    clustering,
    components,
    dedup,
    linear_model,
    multimodal,
    packing,
    profiling,
    relational,
    rollup,
    sampling,
    scale,
    similarity,
    text,
    timeseries,
    udfs,
)

__all__ = [
    "clustering",
    "components",
    "dedup",
    "linear_model",
    "multimodal",
    "packing",
    "profiling",
    "relational",
    "rollup",
    "sampling",
    "scale",
    "similarity",
    "text",
    "timeseries",
    "udfs",
]
