#!/usr/bin/env python
"""Window-partition lint: find single-task window sorts in logical plans.

An unpartitioned ``Window.orderBy(...)`` moves EVERY row to one task no
matter how the upstream is partitioned — the one plan shape that silently
stops scaling at 100×. This module parses optimized-plan ``Window`` nodes
and reports the unpartitioned ones, so tests can assert the only
survivors are the documented bounded-domain stitches (the ≤ n_buckets
offset windows of ``operators/ranks.py``, recognizable by their ``_rkb``
order key — Catalyst folds away their constant ``partitionBy(lit(0))``).

Run standalone to scan every declared catalog query:

    python tools/window_lint.py [names...]
"""

from __future__ import annotations

import os
import re
import sys
from typing import List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: order-spec marker of provably-bounded stitch windows, matched against
#: the ORDER group: `_rkb` is the repo-wide RESERVED bucket-id name —
#: the ranks.py offset stitches and sampling.permutation_index both emit
#: it, and by contract it orders only windows over ≤ n_buckets rows.
#: (Round 8 retired the 1-letter `_b` exemption: too collision-prone as
#: an exact name — ADVICE r7.) Attr refs print as `name#exprId`, so the
#: regex anchors the FULL attribute name — a lookbehind rejects user
#: columns merely ENDING in `_rkb`.
BOUNDED_ORDER_RE = re.compile(r"(?<![A-Za-z0-9_])_rkb#\d+")


def _top_level_groups(s: str) -> List[str]:
    """Split ``[a], [b], [c]`` into top-level bracket groups (expression
    text may contain nested ``[`` from array indexing / struct literals)."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start:i])
                start = None
    return groups


def window_nodes(plan: str) -> List[List[str]]:
    """All ``Window`` nodes in a plan string as bracket-group lists:
    ``[exprs, order]`` (unpartitioned) or ``[exprs, partition, order]``."""
    out = []
    for line in plan.splitlines():
        m = re.search(r"(?:^|[ \-])Window (\[.*)$", line)
        if m:
            out.append(_top_level_groups(m.group(1)))
    return out


def unpartitioned_windows(plan: str) -> List[Tuple[str, str]]:
    """(exprs, order) for every Window node that GLOBALLY SORTS its input
    into one task: no partition spec, a real order spec, and an order key
    that is not a documented bounded-domain stitch marker.

    Catalyst prints ``Window [exprs], [partition], [order]`` but OMITS
    empty groups, so a two-group node is ambiguous: group 2 is an order
    spec iff it carries sort-direction markers (every SortOrder prints
    ``ASC NULLS``/``DESC NULLS``); otherwise it is a partition spec of an
    order-less window (a per-group total — partitioned, scale-fine)."""
    bad = []
    for groups in window_nodes(plan):
        if (
            len(groups) == 2
            and re.search(r"(ASC|DESC) NULLS", groups[1])
            and not BOUNDED_ORDER_RE.search(groups[1])
        ):
            bad.append((groups[0], groups[1]))
    return bad


def main() -> None:
    from pipes_spark.catalog import QUERIES
    from pipes_spark.session import get_spark
    from tests.test_plans import CONSTRUCTION_JOB_EXEMPT

    spark = get_spark("window_lint")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or [
        n
        for n in QUERIES
        if n not in CONSTRUCTION_JOB_EXEMPT and not n.startswith("streaming_")
    ]
    hits = 0
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"ERROR {name}: {e}")
            hits += 1
            continue
        for exprs, order in unpartitioned_windows(plan):
            hits += 1
            print(f"{name}: ORDER [{order[:120]}] EXPRS [{exprs[:120]}]")
    print(f"{hits} unpartitioned data windows")
    sys.exit(1 if hits else 0)


if __name__ == "__main__":
    main()
