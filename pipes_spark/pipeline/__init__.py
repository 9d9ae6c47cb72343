"""Dataflow-graph framework: the reference's public surface re-expressed
Spark-first (SURVEY.md §2.A)."""

from .builder import Pipeline
from .errors import BuildError, GraphError, PipelineError, RunError, SchemaMismatchError
from .nodes import (
    Bypass,
    Final,
    IgnoreFinal,
    IgnoreStart,
    Middle,
    NodesMap,
    Start,
)
from .runner import Runner, Sink

__all__ = [
    "Pipeline",
    "Runner",
    "Sink",
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
