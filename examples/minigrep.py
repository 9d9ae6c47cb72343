#!/usr/bin/env python
"""minigrep — the reference's tutorial application
(ref: tutorial/minigrep/minigrep.go:117-144) re-expressed as a pipes_spark
pipeline: FileFinder -> FileScanner -> MatchFilter -> Printer becomes
read_text source -> rlike filter middle (provider validates the pattern at
build time, invalid regex aborts the build) -> format middle -> print sink.

Usage: python examples/minigrep.py PATTERN FILE [FILE...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pipes_spark as ps
from pipes_spark import Final, Middle, NodesMap, Pipeline, Start
from pipes_spark.sources import read_text


class MiniGrep(NodesMap):
    finder = Start()    # FileFinder+FileScanner: paths -> (file_name, line)
    matcher = Middle()  # MatchFilter: regex-validated at build time
    printer = Final()   # Printer

    def connect(self):
        self.finder.send_to(self.matcher)
        self.matcher.send_to(self.printer)


def match_filter_provider(pattern: str):
    """Compile-at-build-time provider: a bad regex aborts build() with
    BuildError, the analog of MatchFilterProvider returning an error
    (ref: tutorial/minigrep/minigrep.go:91-105)."""

    def provider():
        re.compile(pattern)  # raises on invalid pattern -> BuildError
        return lambda df: df.filter(F.col("line").rlike(pattern))

    return provider


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    pattern, paths = sys.argv[1], sys.argv[2:]
    spark = ps.get_spark("minigrep", shuffle_partitions=4)
    p = Pipeline(MiniGrep, spark=spark)
    p.add_start("finder", lambda s: read_text(s, paths))
    p.add_middle_provider("matcher", match_filter_provider(pattern))
    p.add_final(
        "printer",
        lambda df: [
            print(f"{r.file_name}: {r.line}") for r in df.collect()
        ],
    )
    p.build().start().done()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
