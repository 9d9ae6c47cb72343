"""Node declarations and handles for the dataflow graph.

The reference models a pipeline as a typed struct of node fields plus a
``Connect()`` method wiring them with ``SendTo`` (ref: pipe/providers.go:7-27,
pipe/node.go:26-29). Here the same shape is a ``NodesMap`` subclass with
``Start``/``Middle``/``Final`` class attributes and a ``connect()`` method
calling ``handle.send_to(...)``.

Execution-model difference (deliberate, Spark-first): a node is NOT a
goroutine+channel (ref: pipe/node.go:175-178); it is a declarative step in a
DataFrame plan. Edges carry lazy DataFrames; Catalyst plans the physical
execution, so fan-out is a shared subplan and fan-in is UNION ALL.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .errors import GraphError

#: Sentinel meaning "no function registered for this field yet".
_UNSET = object()


class _Disabled:
    """Sentinel for an explicitly disabled node (ref: pipe/bypass.go:5-21)."""

    def __init__(self, label: str):
        self._label = label

    def __repr__(self) -> str:  # pragma: no cover
        return self._label


#: Explicit "this node is disabled" markers, mirroring ``pipe.Bypass[T]()``,
#: ``pipe.IgnoreStart[T]()`` and ``pipe.IgnoreFinal[T]()``
#: (ref: pipe/bypass.go:5-21). Registering one of these (or ``None``) makes a
#: middle a zero-cost identity and a start/final inert.
BYPASS = _Disabled("Bypass()")
IGNORE = _Disabled("Ignore()")


def Bypass() -> _Disabled:
    """Disabled middle marker (ref: pipe/bypass.go:8-11)."""
    return BYPASS


def IgnoreStart() -> _Disabled:
    """Disabled start marker (ref: pipe/bypass.go:13-16)."""
    return IGNORE


def IgnoreFinal() -> _Disabled:
    """Disabled final marker (ref: pipe/bypass.go:18-21)."""
    return IGNORE


class NodeDecl:
    """Class-level declaration of a node field inside a ``NodesMap``.

    ``in_schema`` / ``out_schema`` are optional Spark ``StructType``s (or DDL
    strings) declaring the edge types. They are the engine's analog of Go's
    generic type parameters: validated at build time, and required to decide
    whether a disabled middle may be bypassed (IN==OUT) or must fail the
    build (IN!=OUT, ref: pipe/builder.go:79-87).
    """

    kind: str = ""

    def __init__(self, in_schema: Any = None, out_schema: Any = None):
        self.in_schema = in_schema
        self.out_schema = out_schema
        self.name: Optional[str] = None

    def __set_name__(self, owner: type, name: str) -> None:
        self.name = name

    def __get__(self, obj: Any, objtype: type | None = None) -> Any:
        if obj is None:
            return self
        store = obj.__dict__.setdefault("_node_handles", {})
        if self.name not in store:
            store[self.name] = NodeHandle(self.name, self.kind, self.in_schema, self.out_schema)
        return store[self.name]


class Start(NodeDecl):
    """Source node: ``fn(spark) -> DataFrame``. Analog of
    ``StartFunc[OUT] func(out chan<- OUT)`` (ref: pipe/node.go:12-14)."""

    kind = "start"


class Middle(NodeDecl):
    """Transform node: ``fn(df) -> DataFrame``; input/output schemas may
    differ, and one input row may produce 0..N output rows. Analog of
    ``MiddleFunc[IN, OUT]`` (ref: pipe/node.go:16-19)."""

    kind = "middle"


class Final(NodeDecl):
    """Sink node: ``fn(df) -> Any`` (an action: write/collect/stream-start).
    Analog of ``FinalFunc[IN]`` (ref: pipe/node.go:21-23)."""

    kind = "final"


class NodeHandle:
    """Per-instance state of one node field: registered fn + out-edges."""

    def __init__(self, name: str, kind: str, in_schema: Any = None, out_schema: Any = None):
        self.name = name
        self.kind = kind
        self.in_schema = in_schema
        self.out_schema = out_schema
        self.fn: Any = _UNSET
        self.receivers: list[NodeHandle] = []

    # -- wiring -----------------------------------------------------------
    def send_to(self, *receivers: "NodeHandle") -> None:
        """Wire this sender to one or more receivers
        (ref: pipe/node.go:26-29). Sending into a start node or out of a
        final node is a graph error — the reference makes this a
        compile-time impossibility via the Sender/Receiver interfaces."""
        if self.kind == "final":
            raise GraphError(f"final node {self.name!r} cannot send (it is a sink)")
        for r in receivers:
            if not isinstance(r, NodeHandle):
                raise GraphError(
                    f"{self.name}.send_to expects node handles, got {type(r).__name__}"
                )
            if r.kind == "start":
                raise GraphError(f"cannot send into start node {r.name!r} (it is a source)")
            self.receivers.append(r)

    @property
    def disabled(self) -> bool:
        return self.fn is None or isinstance(self.fn, _Disabled)

    @property
    def registered(self) -> bool:
        return self.fn is not _UNSET

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.kind} {self.name!r}>"


class NodesMap:
    """Base class for pipeline graph declarations.

    Subclasses declare node fields as class attributes and implement
    ``connect()`` (ref: pipe/providers.go:18-27)::

        class Grep(NodesMap):
            reader = Start()
            matcher = Middle()
            printer = Final()

            def connect(self):
                self.reader.send_to(self.matcher)
                self.matcher.send_to(self.printer)
    """

    def connect(self) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} must implement connect() to wire its nodes"
        )

    def _handles(self) -> dict[str, NodeHandle]:
        """All node handles, materializing one per declared field."""
        out: dict[str, NodeHandle] = {}
        for klass in type(self).__mro__:
            for name, attr in vars(klass).items():
                if isinstance(attr, NodeDecl) and name not in out:
                    out[name] = getattr(self, name)
        return out


#: Signature aliases (documentation-only).
StartFunc = Callable[..., Any]  # fn(spark) -> DataFrame
MiddleFunc = Callable[..., Any]  # fn(df) -> DataFrame
FinalFunc = Callable[..., Any]  # fn(df) -> Any
