"""Round-8 additions: Kneser-Ney bigram perplexity, Wilson domain rollup."""

import math

from pyspark.sql import functions as F

from pipes_spark.operators.profiling import wilson_lower_bound
from pipes_spark.operators.text import kneser_ney_perplexity


def _kn_reference(docs, d=0.75):
    """Pure-Python interpolated-KN bigram perplexity, mirroring the
    operator's round-then-decimal-sum convention at float precision."""
    from collections import Counter

    bigrams = {}
    c2 = Counter()
    for doc_id, text in docs:
        ws = [w for w in text.split() if w]
        bg = list(zip(ws, ws[1:]))
        bigrams[doc_id] = bg
        c2.update(bg)
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (v, w), c in c2.items():
        c1[v] += c
        n1f[v] += 1
        n1b[w] += 1
    bt = len(c2)
    out = {}
    from decimal import Decimal

    for doc_id, bg in bigrams.items():
        if not bg:
            continue
        lps = [
            round(
                math.log(
                    (c2[(v, w)] - d) / c1[v] + (d * n1f[v] / c1[v]) * (n1b[w] / bt)
                ),
                6,
            )
            for v, w in bg
        ]
        # DECIMAL sum, mirroring the operator's round-then-DECIMAL-sum
        # convention — a float sum() differs in the last ulp and would
        # make the equality assertion knife-edged on rounding boundaries
        s = float(sum(Decimal(f"{lp:.6f}") for lp in lps))
        out[doc_id] = (len(bg), round(math.exp(-s / len(lps)), 6))
    return out


def test_kneser_ney_matches_reference(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "san francisco san francisco san francisco"),
        (4, "the cat saw san francisco"),
        (5, "one"),  # <2 tokens: no row
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.kn_perplexity)
        for r in kneser_ney_perplexity(df).collect()
    }
    assert got == _kn_reference(docs)


def test_kneser_ney_discount_mass_sums_to_one(spark):
    """Interpolated KN is a proper distribution: for every context v,
    sum over the FULL vocab of P_KN(w|v) == 1 (observed terms plus the
    continuation-weighted backoff mass for unseen ones)."""
    docs = [(1, "a b a c a b b c a"), (2, "b c b a c c a b")]
    from collections import Counter

    d = 0.75
    c2 = Counter()
    for _, text in docs:
        ws = text.split()
        c2.update(zip(ws, ws[1:]))
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (v, w), c in c2.items():
        c1[v] += c
        n1f[v] += 1
        n1b[w] += 1
    bt = len(c2)
    vocab = set(n1b) | set(c1)
    for v in c1:
        total = sum(
            max(c2.get((v, w), 0) - d, 0.0) / c1[v]
            + (d * n1f[v] / c1[v]) * (n1b.get(w, 0) / bt)
            for w in vocab
        )
        assert abs(total - 1.0) < 1e-9, (v, total)


def test_wilson_small_sample_cannot_outrank(spark):
    """3/3 must NOT outrank 960/1000 (the raw rate does), and the lower
    bound must match the closed form."""
    rows = [("tiny", True)] * 3 + [("big", True)] * 960 + [("big", False)] * 40
    df = spark.createDataFrame(rows, "source string, ok boolean")
    got = {
        r.source: r for r in wilson_lower_bound(df, F.col("ok"), ["source"]).collect()
    }
    assert got["tiny"].pass_rate == 1.0 and got["big"].pass_rate == 0.96
    assert got["tiny"].wilson_lb < got["big"].wilson_lb

    z = 1.959964
    p, n = 1.0, 3.0
    lb = (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
        1 + z * z / n
    )
    assert got["tiny"].wilson_lb == round(lb, 6)
