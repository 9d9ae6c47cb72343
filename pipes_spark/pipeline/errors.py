"""Error types for the pipeline framework.

Mirrors the reference's build-time failure semantics: any provider error
aborts ``Build`` (ref: pipe/builder.go:110-135), and a disabled (nil)
middle node whose input/output schemas differ is a build error
(ref: pipe/builder.go:79-87, pipe/bypass_test.go:169-200).
"""

from __future__ import annotations


class PipelineError(Exception):
    """Base class for all pipes_spark errors."""


class BuildError(PipelineError):
    """Raised when ``Pipeline.build()`` fails (provider error, bad wiring,
    schema mismatch...). Analog of the ``error`` return of ``Builder.Build``
    (ref: pipe/builder.go:98-141)."""


class GraphError(BuildError):
    """Invalid graph shape: cycles, edges into a start node, unknown field."""


class SchemaMismatchError(BuildError):
    """Schemas incompatible across an edge or at a fan-in. Analog of Go's
    compile-time type check on ``SendTo`` (ref: tutorial/README.md:303-305)
    and the runtime check ``"Expecting pipe.MiddleFunc[int,string]"``
    (ref: pipe/builder.go:81-87)."""


class RunError(PipelineError):
    """One or more sink actions failed at runtime; carries per-sink errors."""

    def __init__(self, failures: dict[str, BaseException]):
        self.failures = failures
        detail = "; ".join(f"{k}: {type(v).__name__}: {v}" for k, v in failures.items())
        super().__init__(f"{len(failures)} sink(s) failed: {detail}")
