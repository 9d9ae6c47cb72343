"""Distributed linear-model training over embedding columns: binary
logistic regression by full-batch gradient descent — the supervised
complement to ``clustering.kmeans_fit`` (e.g. training a quality-classifier
head on document embeddings, the fasttext-style filtering stage of a
curation pipeline).

In the reference this would be per-element state accumulation in a
``MiddleFunc`` (ref: pipe/node.go:16-19); here every GD round is one
declarative aggregate.

Scale (100 TB design points):

* **Per-round cost is one map-side Arrow pass + ONE (dim+1)-cell shuffle**:
  the weight vector (KBs) is embedded in the UDF, each batch computes its
  gradient contributions with a numpy matmul, and the per-dimension sums
  aggregate as DECIMAL(38,18) — exact and order-independent, so training is
  bit-reproducible across partitionings, retries, and cluster sizes (float
  gradient accumulation is not).
* **Lineage is cut every round** — each round is a fresh aggregate over the
  base scan with the new driver-held weights; nothing iterative accumulates
  in the plan.
* Full-batch GD (not SGD): on a cluster a pass over the data is the unit of
  cost, and exact full-batch gradients are what make the fit reproducible;
  for faster convergence swap the round's input for a
  ``sampling.deterministic_sample`` mini-batch — same machinery.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACC = "decimal(38,18)"


def fit_logistic(
    df: DataFrame,
    label: F.Column,
    vec_col: str = "embedding",
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    round_decimals: int = 12,
) -> list[float]:
    """Binary logistic regression weights ``[w_1..w_dim, bias]`` minimizing
    log-loss of ``label`` (a 0/1 column expression) on the vector column.

    Gradient = Σ_rows (σ(w·x + b) − y)·[x, 1] / n (+ l2·w), computed
    map-side per Arrow batch and summed exactly (see module docstring);
    weights are rounded to ``round_decimals`` each round so any engine
    that sums exactly reproduces the trajectory verbatim."""
    import numpy as np

    base = df.select(F.col(vec_col).alias("_v"), label.cast("double").alias("_y"))
    dim = len(base.select("_v").first()[0])
    w = [0.0] * (dim + 1)

    for _ in range(iters):
        w_now = list(w)

        @F.pandas_udf("array<double>")
        def grad(v: pd.Series, y: pd.Series) -> pd.Series:
            import numpy as np

            wv = np.array(w_now[:-1])
            b = w_now[-1]
            X = np.vstack(v.to_numpy()).astype("float64")
            z = X @ wv + b
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y.to_numpy(dtype="float64")
            G = np.hstack([X * r[:, None], r[:, None]])
            return pd.Series(list(G))

        sums = [
            F.sum(F.element_at(F.col("_g"), i).cast(_ACC)).alias(f"g{i}")
            for i in range(1, dim + 2)
        ]
        row = (
            base.select(grad(F.col("_v"), F.col("_y")).alias("_g"))
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .first()
        )
        n = row["n"]
        g = np.array([float(row[f"g{i}"]) for i in range(1, dim + 2)]) / n
        if l2:
            g[:-1] += l2 * np.array(w[:-1])
        w = [round(wi - lr * gi, round_decimals) for wi, gi in zip(w, g)]
    return w


def predict_logistic(
    df: DataFrame,
    weights: Sequence[float],
    vec_col: str = "embedding",
    prob_col: str = "prob",
) -> DataFrame:
    """Input plus ``prob`` = σ(w·x + b) and ``pred`` ∈ {0, 1} (threshold
    0.5). Map-side Arrow pass against the broadcast weights."""
    w_list = list(map(float, weights))

    @F.pandas_udf("double")
    def prob(v: pd.Series) -> pd.Series:
        import numpy as np

        wv = np.array(w_list[:-1])
        b = w_list[-1]
        X = np.vstack(v.to_numpy()).astype("float64")
        return pd.Series(1.0 / (1.0 + np.exp(-(X @ wv + b))))

    return df.withColumn(prob_col, F.round(prob(F.col(vec_col)), 6)).withColumn(
        "pred", (F.col(prob_col) >= 0.5).cast("int")
    )


def auc_roc(
    df: DataFrame,
    label: F.Column,
    score: F.Column,
    round_decimals: int = 6,
) -> DataFrame:
    """Exact ROC AUC of ``score`` against binary ``label`` — the
    threshold-free classifier metric, via the Mann-Whitney identity
    AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻).

    Computed on the GROUPED score domain, never per row: one aggregate to
    ``(score, n_pos, n_neg)``, a cumulative-negatives window over the
    distinct scores, and the integer identity

        AUC = Σ_s n_pos(s) · (2·cumneg(<s) + n_neg(s))  /  (2·P·N)

    The numerator is a sum of LONGs — exact and order-independent, so the
    result is bit-stable across engines and partitionings (only the final
    division is floating). The cumulative-negatives pass runs over the
    |distinct scores| domain via ``ranks.bucketed_cumsum`` — bucket-parallel,
    never a single-partition sort, so a continuous score column (distinct
    domain ≈ n) still scales; the stitched cumsum is row-for-row equal to
    the global window (the oracle hash-checks it).
    Returns one row ``(auc, n_pos, n_neg)``; ``auc`` is NULL when either
    class is empty (nullif guard — ANSI mode throws on bare ÷0).
    """
    from .ranks import bucketed_cumsum

    per = (
        df.select(label.cast("int").alias("_y"), score.alias("_s"))
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("long").alias("_np"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("_nn"),
        )
    )
    cum = bucketed_cumsum(per, "_s", {"_cneg": "_nn"}).withColumn(
        "_cneg", F.col("_cneg").cast("long")
    )
    # per-term products and the grand total go through DECIMAL (exact,
    # order-independent; at 100 TB the rank-sum numerator exceeds LONG
    # range and ANSI throws); the single final division runs in DOUBLE so
    # both engines round the same quotient
    num = F.sum(
        F.col("_np").cast("decimal(19,0)")
        * (F.lit(2) * F.col("_cneg") + F.col("_nn")).cast("decimal(19,0)")
    )
    den = (
        F.lit(2).cast("decimal(19,0)")
        * F.sum("_np").cast("decimal(19,0)")
        * F.sum("_nn").cast("decimal(19,0)")
    )
    return cum.agg(
        F.round(
            num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)),
            round_decimals,
        ).alias("auc"),
        F.sum("_np").cast("bigint").alias("n_pos"),
        F.sum("_nn").cast("bigint").alias("n_neg"),
    )


def calibration_bins(
    df: DataFrame,
    label: F.Column,
    score: F.Column,
    tiebreak: F.Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: equal-frequency score bins with the mean
    predicted score and the observed positive rate per bin — the standard
    calibration readout for a probabilistic classifier (a calibrated model
    has avg_score ≈ pos_rate in every bin).

    Deterministic ntile over (score, tiebreak); per-bin mean score sums
    DECIMAL(28,6) (round the score to ≤6 decimals first — then the mean is
    exact and order/engine-independent), positive rate is an integer ratio.
    The tile assignment is the bucket-parallel ``ranks.bucketed_ntile`` —
    exact global ntile semantics (oracle hash-checked against the
    global-sort SQL) with no single-partition sort, so it scales past the
    one-task window the naive form serializes through.
    """
    from .ranks import bucketed_ntile

    base = df.select(
        label.cast("int").alias("_y"),
        F.round(score, 6).alias("_s"),
        tiebreak.alias("_t"),
    )
    return (
        bucketed_ntile(base, "_s", [F.col("_s"), F.col("_t")], n_bins, "bin")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(
                F.sum(F.col("_s").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_score"),
            F.round(F.sum("_y") / F.count(F.lit(1)), 6).alias("pos_rate"),
        )
    )


def prob_metrics(
    df: DataFrame,
    label: F.Column,
    prob: F.Column,
    eps: float = 1e-6,
) -> DataFrame:
    """Proper-scoring-rule metrics for probabilistic predictions: mean
    log-loss (cross-entropy) and Brier score — the pair that, unlike
    accuracy/AUC, punishes CONFIDENT wrong probabilities and so actually
    measures calibration quality end to end.

    Probabilities clamp into [eps, 1−eps] (log-loss is infinite at a
    confident miss otherwise); per-row terms round to 6 decimals and sum
    DECIMAL, so the means are order- and engine-exact. One aggregate, no
    shuffle beyond it. Returns one row ``(n, log_loss, brier)``."""
    p = F.least(F.lit(1.0 - eps), F.greatest(F.lit(eps), prob.cast("double")))
    y = label.cast("int").cast("double")
    ll = F.round(-(y * F.log(p) + (1.0 - y) * F.log(1.0 - p)), 6)
    br = F.round((p - y) * (p - y), 6)
    # rows with a NULL prediction are EXCLUDED (greatest/least skip NULLs,
    # which would silently score a missing prediction as a confident eps);
    # n reports the scored rows only
    return df.filter(prob.isNotNull()).select(ll.alias("_ll"), br.alias("_br")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("_ll").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("log_loss"),
        F.round(
            F.sum(F.col("_br").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("brier"),
    )


def naive_bayes_confusion(
    df: DataFrame,
    class_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial naive Bayes trained on the corpus' own labels and
    scored back over it — the classic bag-of-words classifier as pure
    count aggregation, reported as a (actual, predicted) confusion
    matrix. As a curation readout this is the label-consistency audit:
    documents whose own token distribution argues for a DIFFERENT class
    than their label (off-diagonal mass) are the mislabeled / mixed /
    boilerplate candidates.

    score(d, c) = ln P(c) + Σ_w∈d ln (C(w,c)+1)/(C(c)+V)  (add-one
    smoothing over the corpus vocabulary V), predicted = argmax_c with
    class-name tie-break.

    Scale: tokenization explodes once (persisted for the query), model
    "training" is two count aggregates — (w, class) counts and per-class
    totals, the ingest-time artifact you'd persist at 100 TB — and
    scoring re-keys the token stream by w to join the model (co-keyed
    equi-join), fans out only by the number of classes (bounded), then
    reduces per (doc, class). Per-token ln terms round(6) then DECIMAL-
    sum (the perplexity pattern) so scores are engine- and order-exact;
    the class spine and per-class totals are broadcast.
    """
    from pyspark.sql import Window

    from ..caching import scoped_persist
    from .text import tokens

    toks = scoped_persist(
        df.select(
            F.col(id_col).alias("_doc"),
            F.col(class_col).alias("_actual"),
            F.explode(tokens(text_col)).alias("_w"),
        )
    )
    # model: class priors, per-class token totals, (w, class) counts, |V|
    docs = df.select(F.col(id_col).alias("_doc"), F.col(class_col).alias("_cls"))
    priors = docs.groupBy("_cls").agg(F.count(F.lit(1)).alias("_ndocs"))
    n_all = docs.agg(F.count(F.lit(1)).alias("_n"))
    ctot = toks.groupBy(F.col("_actual").alias("_cls")).agg(
        F.count(F.lit(1)).alias("_nc")
    )
    cwc = toks.groupBy("_w", F.col("_actual").alias("_cls")).agg(
        F.count(F.lit(1)).alias("_cwc")
    )
    vocab = toks.agg(F.count_distinct("_w").alias("_v"))
    # class spine: every doc token scored under every class
    spine = F.broadcast(
        priors.crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(vocab))
        .join(ctot, "_cls")
        .select(
            "_cls",
            F.round(F.log(F.col("_ndocs") / F.col("_n").cast("double")), 6)
            .cast("decimal(28,6)")
            .alias("_logprior"),
            "_nc",
            "_v",
        )
    )
    cwc2 = cwc.select(
        F.col("_w").alias("_w2"), F.col("_cls").alias("_cls2"), "_cwc"
    )
    scored = (
        toks.crossJoin(spine)
        .join(
            cwc2,
            (F.col("_w") == F.col("_w2")) & (F.col("_cls") == F.col("_cls2")),
            "left",
        )
        .select(
            "_doc",
            "_actual",
            "_cls",
            "_logprior",
            F.round(
                F.log(
                    (F.coalesce(F.col("_cwc"), F.lit(0)) + 1)
                    / (F.col("_nc") + F.col("_v")).cast("double")
                ),
                6,
            )
            .cast("decimal(28,6)")
            .alias("_lp"),
        )
    )
    per_dc = scored.groupBy("_doc", "_actual", "_cls").agg(
        (F.first("_logprior") + F.sum("_lp")).alias("_score")
    )
    w = Window.partitionBy("_doc").orderBy(F.col("_score").desc(), F.col("_cls").asc())
    pred = (
        per_dc.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("_doc", "_actual", F.col("_cls").alias("predicted"))
    )
    return (
        pred.groupBy(F.col("_actual").alias(class_col), "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def fit_ridge(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    l2: float = 0.0,
    intercept: bool = True,
) -> DataFrame:
    """Ridge (L2-regularized) linear regression by distributed normal
    equations: ONE aggregation pass accumulates the Gram matrix XᵀX and
    moment vector Xᵀy as exact DECIMAL sums — (d+1)(d+4)/2 cells through
    the shuffle regardless of row count — then the (d+1)×(d+1) solve
    happens driver-side with numpy (the documented small-side contract:
    a few hundred floats, like the k-means codebook). β =
    (XᵀX + λI)⁻¹ Xᵀy, with the intercept unpenalized as standard.

    Because the sufficient statistics are DECIMAL (order-independent,
    exact at 12 decimals per term), the fit is bit-reproducible across
    partitionings, retries, and cluster sizes — the same property the
    logistic trainer guarantees for its gradients. Features and label
    quantize to 6 decimals first.

    Returns a small DataFrame of (feature, coef), one row per feature
    (plus ``intercept`` when requested).
    """
    import numpy as np

    cols = list(feature_cols)
    xs = [F.round(F.col(c).cast("double"), 6) for c in cols]
    names = list(cols)
    if intercept:
        xs = [F.lit(1.0)] + xs
        names = ["intercept"] + names
    d = len(xs)
    y = F.round(F.col(label_col).cast("double"), 6)
    acc = "decimal(38,12)"
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum((xs[i] * xs[j]).cast(acc)).alias(f"_xx_{i}_{j}"))
        aggs.append(F.sum((xs[i] * y).cast(acc)).alias(f"_xy_{i}"))
    row = df.agg(*aggs).collect()[0]
    A = np.zeros((d, d))
    b = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = float(row[f"_xx_{i}_{j}"])
        b[i] = float(row[f"_xy_{i}"])
    reg = np.eye(d) * float(l2)
    if intercept:
        reg[0, 0] = 0.0  # the intercept is conventionally unpenalized
    beta = np.linalg.solve(A + reg, b)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(names[i], round(float(beta[i]), 6)) for i in range(d)],
        "feature string, coef double",
    )


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Distributed PCA over an embedding column: ONE Arrow pass computes
    per-batch sufficient statistics (n, Σx, upper-triangle of Σxxᵀ)
    with a numpy matmul — d(d+3)/2 + 1 cells per BATCH, never per row —
    which reduce to global sums via a (position, value) explode +
    DECIMAL aggregate; the d×d covariance assembles and eigendecomposes
    driver-side (numpy ``eigh`` on KBs — the fit_ridge small-side
    contract). Returns the top-``k`` components' eigenvalues and
    explained-variance ratios.

    Precision note: within-batch sums are IEEE float64 (row order inside
    a batch), so unlike fit_ridge the fit is reproducible for a FIXED
    partitioning rather than bit-identical across partitionings; the
    cross-batch reduce is still exact DECIMAL, and eigenvalue ratios are
    rounded at 6 — far above any batch-order drift.
    """
    import numpy as np

    from ..caching import scoped_persist
    from .scale import ensure_min_partitions

    dim = len(df.select(vec_col).first()[0])
    iu = np.triu_indices(dim)

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            G = X.T @ X
            yield pd.DataFrame(
                [
                    {
                        "n": len(X),
                        "sx": [float(v) for v in X.sum(axis=0)],
                        "sxx": [float(v) for v in G[np.triu_indices(X.shape[1])]],
                    }
                ]
            )

    parts = scoped_persist(
        ensure_min_partitions(df.select(vec_col)).mapInPandas(
            partials, schema="n bigint, sx array<double>, sxx array<double>"
        )
    )
    n = parts.agg(F.sum("n")).first()[0]
    acc = "decimal(38,12)"

    def reduce_vec(col: str) -> "np.ndarray":
        rows = (
            parts.select(F.posexplode(col).alias("pos", "v"))
            .groupBy("pos")
            .agg(F.sum(F.col("v").cast(acc)).cast("double").alias("s"))
            .collect()
        )
        out = np.zeros(max(r["pos"] for r in rows) + 1)
        for r in rows:
            out[r["pos"]] = r["s"]
        return out

    sx = reduce_vec("sx")
    sxx_flat = reduce_vec("sxx")
    G = np.zeros((dim, dim))
    G[iu] = sxx_flat
    G = G + G.T - np.diag(np.diag(G))
    mu = sx / n
    C = G / n - np.outer(mu, mu)
    evals = np.linalg.eigh(C)[0][::-1]  # descending
    total = float(evals.sum())
    spark = df.sparkSession
    top = evals[: min(k, dim)]
    return spark.createDataFrame(
        [
            (
                i + 1,
                round(float(v), 6),
                round(float(v) / total, 6) if total > 0 else None,
            )
            for i, v in enumerate(top)
        ],
        "component int, eigenvalue double, explained_variance_ratio double",
    )


def conformal_interval_report(
    df: DataFrame,
    key_col,
    x_col: str,
    y_col: str,
    alpha: float = 0.1,
    salt: str = "conformal",
) -> DataFrame:
    """Split-conformal prediction interval for a simple linear model —
    the distribution-free way to attach a FINITE-SAMPLE-VALID ±q band to
    any point predictor: fit on a deterministic half, take q̂ as the
    ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on the held-out
    calibration half, and [ŷ − q̂, ŷ + q̂] covers ≥ 1−α of future points
    (Vovk et al.; Lei et al. 2018). Returns one row: (n_fit, n_cal,
    slope, intercept, qhat, coverage) with coverage measured over the
    whole table.

    Everything stays IN-PLAN and lazy: the OLS fit is a 1-row DECIMAL
    sufficient-statistics aggregate cross-joined back (linear_fit's
    normal equations), the conformal rank is an exact GLOBAL row_number
    over the calibration residuals computed bucket-parallel
    (``ranks.bucketed_row_number`` — no single ordered partition; tie-break
    on the key keeps it deterministic), and the split is the portable md5
    bucket.
    """
    from ..caching import scoped_persist
    from .ranks import bucketed_row_number
    from .sampling import hash_bucket

    base = scoped_persist(
        df.select(
            F.col(key_col).alias("_k") if isinstance(key_col, str) else key_col.alias("_k"),
            F.round(F.col(x_col).cast("double"), 6).alias("_x"),
            F.round(F.col(y_col).cast("double"), 6).alias("_y"),
        )
        .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .withColumn("_fit", hash_bucket(F.col("_k"), salt) < (1 << 31))
    )
    acc = "decimal(38,6)"
    st = base.filter(F.col("_fit")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col("_x").cast(acc)).cast("double").alias("_sx"),
        F.sum(F.col("_y").cast(acc)).cast("double").alias("_sy"),
        F.sum((F.col("_x") * F.col("_y")).cast(acc)).cast("double").alias("_sxy"),
        F.sum((F.col("_x") * F.col("_x")).cast(acc)).cast("double").alias("_sxx"),
    )
    nf = F.col("_n").cast("double")
    den = nf * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (nf * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / F.nullif(
        den, F.lit(0.0)
    )
    params = st.select(
        F.col("_n").alias("n_fit"),
        slope.alias("_slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / nf).alias("_b"),
    )
    calib = (
        base.filter(~F.col("_fit"))
        .crossJoin(F.broadcast(params))
        .withColumn(
            "_resid",
            F.round(
                F.abs(F.col("_y") - (F.col("_slope") * F.col("_x") + F.col("_b"))),
                6,
            ),
        )
    )
    ncal = calib.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    qhat = (
        bucketed_row_number(
            calib, "_resid", [F.col("_resid").asc(), F.col("_k").asc()], "_rn"
        )
        .crossJoin(F.broadcast(ncal))
        .filter(
            F.col("_rn")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - alpha)).cast("long"),
                F.col("n_cal"),
            )
        )
        .select("n_cal", F.col("_resid").alias("qhat"))
    )
    covered = (
        base.crossJoin(F.broadcast(params))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.first("n_fit").alias("n_fit"),
            F.first("n_cal").alias("n_cal"),
            F.round(F.first("_slope"), 6).alias("slope"),
            F.round(F.first("_b"), 6).alias("intercept"),
            F.first("qhat").alias("qhat"),
            F.round(
                F.avg(
                    (
                        F.round(
                            F.abs(
                                F.col("_y")
                                - (F.col("_slope") * F.col("_x") + F.col("_b"))
                            ),
                            6,
                        )
                        <= F.col("qhat")
                    ).cast("int")
                ),
                6,
            ).alias("coverage"),
        )
    )
    return covered


def threshold_sweep(
    df: DataFrame,
    label,
    score,
    round_decimals: int = 6,
) -> DataFrame:
    """Classifier threshold sweep: precision / recall / F1 at EVERY
    distinct score cutoff (predict positive when score ≥ t) — the
    operating-point selection table behind "pick the threshold", and the
    domain over which PR curves and F-beta optima live. AUC says how
    good the ranking is; this says where to cut it.

    Same scale shape as :func:`auc_roc`: one aggregate to the GROUPED
    score domain (quantize continuous scores first), then the cumulative
    counts run top-down over distinct scores via ``ranks.bucketed_cumsum``
    (bucket-parallel, no single-partition sort; hash-equal to the global
    window) — never per-row work. All counts exact integers; the P/R/F1
    ratios divide once per DISTINCT score and round(6). Returns
    (threshold, tp, fp, fn, precision, recall, f1) ordered by threshold.
    """
    from .ranks import bucketed_cumsum

    per = (
        df.select(label.cast("int").alias("_y"), score.alias("_s"))
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("long").alias("_np"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("_nn"),
        )
    )
    tot = per.agg(F.sum("_np").cast("long").alias("_P"))
    cum = (
        bucketed_cumsum(
            per,
            "_s",
            {"tp": "_np", "fp": "_nn"},
            inclusive=True,
            descending=True,
        )
        .select(
            F.col("_s").alias("threshold"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
        )
        .crossJoin(F.broadcast(tot))
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = (F.col("_P") - F.col("tp")).cast("double")
    return cum.select(
        "threshold",
        "tp",
        "fp",
        (F.col("_P") - F.col("tp")).cast("long").alias("fn"),
        F.round(tp / F.nullif(tp + fp, F.lit(0.0)), round_decimals).alias(
            "precision"
        ),
        F.round(tp / F.nullif(tp + fn, F.lit(0.0)), round_decimals).alias(
            "recall"
        ),
        F.round(
            2 * tp / F.nullif(2 * tp + fp + fn, F.lit(0.0)), round_decimals
        ).alias("f1"),
    ).orderBy("threshold")


def average_precision(
    df: DataFrame,
    label,
    score,
    round_decimals: int = 6,
) -> DataFrame:
    """Average precision (the area under the precision-recall curve by
    the step rule): AP = Σ_s n_pos(s)·precision(≥s) / P over the distinct
    score cutoffs — the ranking metric that, unlike ROC AUC, stays
    honest under heavy class imbalance (the curation-filter regime:
    a 0.99-AUC model can still have terrible precision at usable recall
    when positives are 1 in 10⁴; AP says so).

    Same grouped-score-domain shape as :func:`auc_roc` and
    :func:`threshold_sweep` (cumulatives via the bucket-parallel
    ``ranks.bucketed_cumsum``, hash-equal to the global window); per-cutoff
    precision terms round(9) then DECIMAL-sum so the result is engine- and
    order-exact. Returns one row (avg_precision, n_pos, n_neg); NULL when
    no positives exist.
    """
    from .ranks import bucketed_cumsum

    per = (
        df.select(label.cast("int").alias("_y"), score.alias("_s"))
        .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("long").alias("_np"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("_nn"),
        )
    )
    cum = bucketed_cumsum(
        per,
        "_s",
        {"_ctp": "_np", "_cfp": "_nn"},
        inclusive=True,
        descending=True,
    ).select(
        "_np",
        "_nn",
        F.col("_ctp").cast("long").alias("_ctp"),
        F.col("_cfp").cast("long").alias("_cfp"),
    )
    term = F.round(
        F.col("_np")
        * (F.col("_ctp") / (F.col("_ctp") + F.col("_cfp")).cast("double")),
        9,
    ).cast("decimal(28,9)")
    return cum.agg(
        F.round(
            F.sum(term).cast("double")
            / F.nullif(F.sum("_np").cast("double"), F.lit(0.0)),
            round_decimals,
        ).alias("avg_precision"),
        F.sum("_np").cast("bigint").alias("n_pos"),
        F.sum("_nn").cast("bigint").alias("n_neg"),
    )


def fit_fellegi_sunter(
    pairs: DataFrame,
    feature_cols: Sequence[str],
    iters: int = 10,
    prevalence: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
    round_decimals: int = 12,
) -> tuple[list[float], list[float], float]:
    """Fellegi–Sunter record-linkage parameters by EM (Fellegi & Sunter
    JASA 1969; Winkler 1988): for candidate pairs with BINARY agreement
    columns ``feature_cols`` (1 = the two records agree on that field),
    learn per-field m = P(agree | match), u = P(agree | non-match) and
    the match prevalence p — unsupervised, from the agreement-pattern
    mixture alone. Returns ``(m, u, p)``.

    Distributed EM: the E-step posterior is a flat per-row codegen
    expression built from the CURRENT scalar parameters (broadcast by
    literal — KBs), and the M-step is ONE map-side-combined aggregate of
    (Σγ, Σγ·g_i, Σ(1−γ)·g_i) per round, accumulated as DECIMAL so the
    fit is bit-reproducible across partitionings and retries. Lineage is
    cut every round (fresh aggregate over the base scan — the
    fit_logistic discipline). Per-round driver collect is one scalar row
    (the documented convergence-scalar contract, like kmeans_fit).
    Parameters clamp to [1e-6, 1−1e-6] so degenerate fields cannot zero
    a likelihood product.
    """
    m = [m_init] * len(feature_cols)
    u = [u_init] * len(feature_cols)
    p = prevalence
    eps = 1e-6
    for _ in range(iters):
        log_w = F.lit(0.0)
        log_v = F.lit(0.0)
        import math

        for i, c in enumerate(feature_cols):
            g = F.col(c).cast("double")
            log_w = log_w + g * math.log(m[i]) + (1.0 - g) * math.log(1.0 - m[i])
            log_v = log_v + g * math.log(u[i]) + (1.0 - g) * math.log(1.0 - u[i])
        w = F.lit(p) * F.exp(log_w)
        v = F.lit(1.0 - p) * F.exp(log_v)
        gamma = F.round(w / (w + v), round_decimals)
        aggs = [
            F.sum(gamma.cast(_ACC)).alias("_sg"),
            F.count(F.lit(1)).alias("_n"),
        ]
        for i, c in enumerate(feature_cols):
            gi = F.col(c).cast("double")
            aggs.append(F.sum((gamma * gi).cast(_ACC)).alias(f"_mg{i}"))
            aggs.append(
                F.sum(((F.lit(1.0) - gamma) * gi).cast(_ACC)).alias(f"_ug{i}")
            )
        row = pairs.agg(*aggs).collect()[0]
        sg, n = float(row["_sg"]), float(row["_n"])
        p = min(max(sg / n, eps), 1.0 - eps)
        for i in range(len(feature_cols)):
            m[i] = min(max(float(row[f"_mg{i}"]) / max(sg, eps), eps), 1.0 - eps)
            u[i] = min(
                max(float(row[f"_ug{i}"]) / max(n - sg, eps), eps), 1.0 - eps
            )
    return m, u, p


def fellegi_sunter_scores(
    pairs: DataFrame,
    feature_cols: Sequence[str],
    m: Sequence[float],
    u: Sequence[float],
    p: float,
    round_decimals: int = 6,
) -> DataFrame:
    """Score candidate pairs with fitted Fellegi–Sunter parameters: the
    classic log2 match weight Σ_i [g_i·log2(m_i/u_i) +
    (1−g_i)·log2((1−m_i)/(1−u_i))] plus the posterior match probability —
    both flat codegen expressions over the broadcast-by-literal scalars;
    no shuffle, no UDF. Rank/threshold downstream exactly like a blocking
    + clerical-review pipeline would."""
    import math

    weight = F.lit(0.0)
    log_w = F.lit(0.0)
    log_v = F.lit(0.0)
    for i, c in enumerate(feature_cols):
        g = F.col(c).cast("double")
        weight = (
            weight
            + g * math.log2(m[i] / u[i])
            + (1.0 - g) * math.log2((1.0 - m[i]) / (1.0 - u[i]))
        )
        log_w = log_w + g * math.log(m[i]) + (1.0 - g) * math.log(1.0 - m[i])
        log_v = log_v + g * math.log(u[i]) + (1.0 - g) * math.log(1.0 - u[i])
    w = F.lit(p) * F.exp(log_w)
    v = F.lit(1.0 - p) * F.exp(log_v)
    return pairs.select(
        "*",
        F.round(weight, round_decimals).alias("match_weight"),
        F.round(w / (w + v), round_decimals).alias("match_posterior"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col,
    label_col,
    group_col: Optional[str] = None,
    out_col: str = "calibrated",
) -> DataFrame:
    """Isotonic (PAV) probability calibration per model group (Zadrozny &
    Elkan, KDD 2002): the monotone step function minimizing squared error
    of the 0/1 labels against the score order — the non-parametric
    complement to the binned calibration audit (calibration_bins) and the
    conformal intervals. Pool-adjacent-violators runs per group inside
    one Arrow batch (a numpy stack pass, O(n) after the sort).

    Scale contract: ONE shuffle on the group key; a group's calibration
    set must fit a worker — calibration sets are bounded samples by
    construction (the same per-group contract as the PACF grouped map).
    Ties in score share one pooled value (the PAV block mean), so the
    fit is deterministic regardless of within-tie order. Returns the
    input rows plus ``out_col``.
    """
    import numpy as np
    import pandas as pd

    g = group_col or "_g"
    base = (
        df.select(
            F.lit(0).alias("_g") if group_col is None else F.col(group_col),
            F.col(score_col).cast("double").alias("_score"),
            label_col.cast("double").alias("_y")
            if not isinstance(label_col, str)
            else F.col(label_col).cast("double").alias("_y"),
        )
    )

    # group column type follows the input schema — hardcoding 'string'
    # would mis-type a non-string group key (e.g. an int model id) at the
    # applyInPandas Arrow boundary
    g_type = (
        "int" if group_col is None else df.schema[group_col].dataType.simpleString()
    )
    schema = f"{g} {g_type}, _score double, _y double, {out_col} double"

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_score", "_y"], kind="mergesort").reset_index(
            drop=True
        )
        # collapse ties on score first: PAV fits one value per distinct score
        grp = pdf.groupby("_score", sort=True)["_y"].agg(["sum", "count"])
        sums = grp["sum"].to_numpy(dtype=float)
        cnts = grp["count"].to_numpy(dtype=float)
        scores = grp.index.to_numpy()
        # pool adjacent violators (stack of blocks with monotone means)
        bs, bc, bn = [], [], []  # block sum, count, n_distinct_scores
        for s_, c_ in zip(sums, cnts):
            bs.append(s_)
            bc.append(c_)
            bn.append(1)
            while len(bs) > 1 and bs[-2] * bc[-1] >= bs[-1] * bc[-2]:
                bs[-2] += bs[-1]
                bc[-2] += bc[-1]
                bn[-2] += bn[-1]
                bs.pop(), bc.pop(), bn.pop()
        fitted = np.repeat(
            np.array(bs) / np.array(bc), np.array(bn, dtype=int)
        )
        cal = dict(zip(scores, np.round(fitted, 12)))
        pdf[out_col] = pdf["_score"].map(cal)
        return pdf

    out = base.groupBy(g).applyInPandas(pav, schema)
    return out if group_col else out.drop("_g")
