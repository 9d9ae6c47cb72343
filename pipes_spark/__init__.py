"""pipes_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of mariomac/pipes (see SURVEY.md), plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

from .pipeline import (
    BuildError,
    Bypass,
    Final,
    GraphError,
    IgnoreFinal,
    IgnoreStart,
    Middle,
    NodesMap,
    Pipeline,
    PipelineError,
    RunError,
    Runner,
    SchemaMismatchError,
    Start,
)
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Pipeline",
    "Runner",
    "NodesMap",
    "Start",
    "Middle",
    "Final",
    "Bypass",
    "IgnoreStart",
    "IgnoreFinal",
    "PipelineError",
    "BuildError",
    "GraphError",
    "SchemaMismatchError",
    "RunError",
]
