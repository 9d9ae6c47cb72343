"""Pipeline builder: registration, providers, build-time folding to DataFrames.

Mirrors the reference's Builder lifecycle (ref: pipe/builder.go:98-141):
``Pipeline(NodesMapSubclass) → add_*/add_*_provider → build() → Runner``.

* Providers are zero-arg callables evaluated inside ``build()``; an exception
  aborts the whole build (ref: pipe/builder.go:110-135); returning ``None``
  (or a ``Bypass()``/``Ignore*()`` marker) disables the node
  (ref: pipe/bypass.go:23-33, pipe/node.go:163-169).
* Re-registering the same field replaces the previous node — last write wins,
  keyed by field name (ref: pipe/builder.go:21-28).
* Build-time schema validation on edges is the engine's analog of Go's
  compile-time type check on ``SendTo`` (ref: tutorial/README.md:303-305).

Spark-first folding (not in the reference — its §3.3 runtime is goroutines):
the node graph is folded into one lazy DataFrame expression per sink.
Fan-out = shared subplan (optionally persisted: pipes pushes each computed
element once, while Spark would recompute the shared subplan per action —
ref: pipe/internal/connect/connectors.go:57-90 vs our persist heuristic).
Fan-in = UNION ALL by name (duplicates kept, interleaving unordered —
ref: pipe/internal/connect/connectors.go:8-41).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from .errors import BuildError, GraphError, SchemaMismatchError
from .nodes import _UNSET, NodeDecl, NodeHandle, NodesMap, _Disabled
from .runner import Runner, Sink

FieldRef = Union[str, NodeDecl]


def _field_name(field: FieldRef) -> str:
    if isinstance(field, NodeDecl):
        if field.name is None:
            raise GraphError("node declaration is not attached to a NodesMap class")
        return field.name
    return field


def _schema_of(schema: Any, spark: SparkSession):
    """Normalize a StructType-or-DDL-string declaration to a StructType."""
    if schema is None:
        return None
    if isinstance(schema, str):
        from pyspark.sql.types import StructType, _parse_datatype_string

        parsed = _parse_datatype_string(schema)
        if not isinstance(parsed, StructType):
            raise BuildError(f"schema declaration must be a struct, got {parsed}")
        return parsed
    return schema


def _schemas_compatible(a, b) -> bool:
    """Field-name/type equality, ignoring nullability (Spark relaxes it)."""
    if len(a.fields) != len(b.fields):
        return False
    for fa, fb in zip(a.fields, b.fields):
        if fa.name != fb.name or fa.dataType != fb.dataType:
            return False
    return True


class Pipeline:
    """Builder over a ``NodesMap`` (ref: ``NewBuilder``, pipe/builder.go:40-48).

    Options:

    * ``persist_fanout`` — persist a node's DataFrame when >1 downstream sink
      consumes it, so the shared subplan is computed once like pipes' forker
      broadcast (default True).
    * ``fanout_storage`` — storage level for those shared subplans:
      ``"memory"`` (MEMORY_AND_DISK, default — small/medium intermediates) or
      ``"disk"`` (DISK_ONLY — the 100 TB-safe choice: a huge shared
      intermediate spills to executor-local disk instead of evicting the
      working set from storage memory; each sink then re-reads serialized
      blocks, the batch analog of a staging table).
    * ``channel_buffer_len`` — accepted for API parity with
      ``pipe.ChannelBufferLen`` (ref: pipe/options.go:12-22). Batch Spark is
      pull-based with no per-edge buffers, so this is a documented no-op.
    """

    def __init__(
        self,
        nodes_map: Union[NodesMap, type],
        *,
        spark: Optional[SparkSession] = None,
        persist_fanout: bool = True,
        fanout_storage: str = "memory",
        channel_buffer_len: int = 0,
    ):
        if isinstance(nodes_map, type):
            nodes_map = nodes_map()
        if not isinstance(nodes_map, NodesMap):
            raise GraphError(f"expected a NodesMap, got {type(nodes_map).__name__}")
        self._impl = nodes_map
        self._spark = spark
        self._persist_fanout = persist_fanout
        if fanout_storage not in ("memory", "disk"):
            raise GraphError(f"fanout_storage must be 'memory' or 'disk', got {fanout_storage!r}")
        self._fanout_storage = fanout_storage
        self._channel_buffer_len = channel_buffer_len
        # field name -> ("fn" | "provider", value); last write wins
        # (ref: pipe/builder.go:21-28)
        self._registrations: dict[str, tuple[str, Any]] = {}

    # -- registration (ref: pipe/providers.go:154-185) --------------------
    def add_start(self, field: FieldRef, fn: Any) -> "Pipeline":
        return self._register(field, "start", "fn", fn)

    def add_middle(self, field: FieldRef, fn: Any) -> "Pipeline":
        return self._register(field, "middle", "fn", fn)

    def add_final(self, field: FieldRef, fn: Any) -> "Pipeline":
        return self._register(field, "final", "fn", fn)

    # -- provider registration (ref: pipe/providers.go:47-152) ------------
    def add_start_provider(self, field: FieldRef, provider: Callable[[], Any]) -> "Pipeline":
        return self._register(field, "start", "provider", provider)

    def add_middle_provider(self, field: FieldRef, provider: Callable[[], Any]) -> "Pipeline":
        return self._register(field, "middle", "provider", provider)

    def add_final_provider(self, field: FieldRef, provider: Callable[[], Any]) -> "Pipeline":
        return self._register(field, "final", "provider", provider)

    def _register(self, field: FieldRef, kind: str, how: str, value: Any) -> "Pipeline":
        name = _field_name(field)
        handles = self._impl._handles()
        if name not in handles:
            raise GraphError(
                f"unknown node field {name!r} on {type(self._impl).__name__}; "
                f"declared fields: {sorted(handles)}"
            )
        if handles[name].kind != kind:
            raise GraphError(
                f"field {name!r} is a {handles[name].kind} node, registered as {kind}"
            )
        self._registrations[name] = (how, value)
        return self

    # -- build (ref: pipe/builder.go:98-141) ------------------------------
    def build(self) -> Runner:
        spark = self._spark or SparkSession.getActiveSession()
        if spark is None:
            raise BuildError("no SparkSession: pass spark= to Pipeline or create one")

        handles = self._impl._handles()

        # 1. evaluate providers; any error aborts the build
        #    (ref: pipe/builder.go:110-135, tests pipe/builder_test.go:24-61)
        for name, (how, value) in self._registrations.items():
            if how == "provider":
                try:
                    fn = value()
                except Exception as e:
                    raise BuildError(f"provider for node {name!r} failed: {e}") from e
            else:
                fn = value
            handles[name].fn = fn

        # 2. disabled-middle type check: a nil middle is only bypassable when
        #    its declared IN and OUT schemas agree (ref: pipe/builder.go:79-87)
        for h in handles.values():
            if h.kind == "middle" and (not h.registered or h.disabled):
                in_s = _schema_of(h.in_schema, spark)
                out_s = _schema_of(h.out_schema, spark)
                if in_s is not None and out_s is not None and not _schemas_compatible(in_s, out_s):
                    raise SchemaMismatchError(
                        f"node {h.name!r}: expecting MiddleFunc[{in_s.simpleString()}, "
                        f"{out_s.simpleString()}] — a disabled middle cannot change the schema"
                    )

        # 3. wire edges (ref: pipe/builder.go:139 calls Connect())
        try:
            self._impl.connect()
        except (BuildError, GraphError):
            raise
        except Exception as e:
            raise BuildError(f"connect() failed: {e}") from e

        # 4. reverse edges + cycle check (cycles are undetected in the
        #    reference — TODO.md:4 — we make them a build error)
        incoming: dict[str, list[NodeHandle]] = {n: [] for n in handles}
        for h in handles.values():
            for r in h.receivers:
                incoming[r.name].append(h)
        self._check_acyclic(handles)

        # 5. fold the graph into one DataFrame per sink (lazy; no jobs run)
        memo: dict[str, Optional[DataFrame]] = {}
        persisted: list[DataFrame] = []

        # sink-reachability per node, to persist only genuinely shared subplans
        sink_users: dict[str, int] = {n: 0 for n in handles}
        for h in handles.values():
            if h.kind == "final" and h.registered and not h.disabled:
                seen: set[str] = set()
                stack = [h.name]
                while stack:
                    cur = stack.pop()
                    if cur in seen:
                        continue
                    seen.add(cur)
                    sink_users[cur] += 1
                    stack.extend(s.name for s in incoming[cur])

        def fold(h: NodeHandle) -> Optional[DataFrame]:
            if h.name in memo:
                return memo[h.name]
            if h.kind == "start":
                # unregistered / disabled starts are silently inert
                # (ref: pipe/node.go:163-169, test pipe/node_test.go:208-251)
                df = None if (not h.registered or h.disabled) else h.fn(spark)
                if df is not None:
                    self._validate_schema(h, "out_schema", df, spark)
            else:
                in_dfs = [fold(s) for s in incoming[h.name]]
                in_dfs = [d for d in in_dfs if d is not None]
                df_in = self._fan_in(h, in_dfs) if in_dfs else None
                if df_in is None:
                    df = None  # inert upstream cascades downstream
                elif not h.registered or h.disabled:
                    df = df_in  # zero-cost bypass (ref: pipe/bypass.go:23-33)
                else:
                    self._validate_schema(h, "in_schema", df_in, spark)
                    try:
                        df = h.fn(df_in)
                    except Exception as e:
                        raise BuildError(f"node {h.name!r} failed while building: {e}") from e
                    if df is not None:
                        self._validate_schema(h, "out_schema", df, spark)
            if (
                df is not None
                and self._persist_fanout
                and h.kind != "final"
                and len(h.receivers) > 1
                and sink_users[h.name] > 1
                and not df.isStreaming  # persist is invalid on streams; each
                # sink re-reads the source (exactly the streaming contract)
            ):
                from pyspark import StorageLevel

                level = (
                    StorageLevel.DISK_ONLY
                    if self._fanout_storage == "disk"
                    else StorageLevel.MEMORY_AND_DISK
                )
                df = df.persist(level)
                persisted.append(df)
            memo[h.name] = df
            return df

        sinks: list[Sink] = []
        for h in handles.values():
            if h.kind != "final":
                continue
            if not h.registered or h.disabled:
                continue  # inert final (ref: pipe/node.go:100-125)
            df_in_list = [fold(s) for s in incoming[h.name]]
            df_in_list = [d for d in df_in_list if d is not None]
            if not df_in_list:
                continue
            df_in = self._fan_in(h, df_in_list)
            self._validate_schema(h, "in_schema", df_in, spark)
            sinks.append(Sink(h.name, h.fn, df_in))

        return Runner(sinks, persisted=persisted)

    # -- helpers ----------------------------------------------------------
    def _fan_in(self, h: NodeHandle, dfs: list[DataFrame]) -> DataFrame:
        """N senders into one receiver = UNION ALL, duplicates kept
        (ref: pipe/internal/connect/connectors.go:8-41). Schemas must agree —
        the analog of all senders sharing one channel element type."""
        if len(dfs) == 1:
            return dfs[0]
        first = dfs[0].schema
        for d in dfs[1:]:
            if not _schemas_compatible(first, d.schema):
                raise SchemaMismatchError(
                    f"fan-in at node {h.name!r}: incompatible schemas "
                    f"{first.simpleString()} vs {d.schema.simpleString()}"
                )
        return reduce(lambda a, b: a.unionByName(b), dfs)

    def _validate_schema(self, h: NodeHandle, which: str, df: DataFrame, spark) -> None:
        declared = _schema_of(getattr(h, which), spark)
        if declared is not None and not _schemas_compatible(declared, df.schema):
            raise SchemaMismatchError(
                f"node {h.name!r} {which} mismatch: declared "
                f"{declared.simpleString()}, actual {df.schema.simpleString()}"
            )

    def _check_acyclic(self, handles: dict[str, NodeHandle]) -> None:
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {n: WHITE for n in handles}

        def visit(h: NodeHandle) -> None:
            color[h.name] = GRAY
            for r in h.receivers:
                if color[r.name] == GRAY:
                    raise GraphError(f"cycle detected through node {r.name!r}")
                if color[r.name] == WHITE:
                    visit(r)
            color[h.name] = BLACK

        for h in handles.values():
            if color[h.name] == WHITE:
                visit(h)
