"""Smoke tests: every shipped example must run end-to-end against the real
testdata (in-process — getOrCreate reuses the test session)."""

from __future__ import annotations

import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES)


def test_minigrep_example(spark, tmp_path, monkeypatch, capsys, job_budget, action_audit):
    import minigrep

    f = tmp_path / "input.txt"
    f.write_text("hello click world\nno match here\nanother click line\n")
    monkeypatch.setattr(sys, "argv", ["minigrep.py", "click", str(f)])
    # 1 action: the print-sink collect
    with job_budget("minigrep", 4), action_audit("minigrep", 1):
        assert minigrep.main() == 0
    out = capsys.readouterr().out
    assert out.count("click") >= 2 and "no match here" not in out


def test_product_analytics_example(spark, sf_dir, monkeypatch, capsys, job_budget, action_audit):
    import product_analytics

    monkeypatch.setattr(sys, "argv", ["product_analytics.py", sf_dir])
    # 5 actions: 3 declared sinks (session-stats count, daily count, funnel
    # collect) + 2 persisted fan-out materializations (events→2, sessions→2)
    with job_budget("product_analytics", 16), action_audit("product_analytics", 5):
        assert product_analytics.main() == 0
    out = capsys.readouterr().out
    assert "sessions=" in out and "step 3 purchase" in out


def test_stream_portability_example(spark, sf_dir, monkeypatch, capsys, job_budget):
    import stream_portability

    monkeypatch.setattr(sys, "argv", ["stream_portability.py", sf_dir])
    monkeypatch.delenv("KAFKA_BOOTSTRAP", raising=False)
    with job_budget("stream_portability", 10):
        assert stream_portability.main() == 0
    out = capsys.readouterr().out
    assert "windows=" in out and "events=" in out


def test_corpus_pipeline_example(spark, sf_dir, tmp_path, monkeypatch, job_budget, action_audit):
    import corpus_pipeline

    out_dir = str(tmp_path / "corpus_out")
    monkeypatch.setattr(sys, "argv", ["corpus_pipeline.py", sf_dir, out_dir])
    # 9 actions: 3 declared sinks (corpus write, report collect, manifest
    # write) + 1 persisted fan-out (split→3) + 5 connected-components
    # convergence actions inside drop_near_duplicates (documented
    # iterative contract)
    with job_budget("corpus_pipeline", 70), action_audit("corpus_pipeline", 9):
        assert corpus_pipeline.main() == 0
    assert os.path.isdir(os.path.join(out_dir, "corpus"))


def test_embedding_pipeline_example(spark, sf_dir, monkeypatch, capsys, tmp_path, job_budget, action_audit):
    import embedding_pipeline

    monkeypatch.setattr(sys, "argv", ["embedding_pipeline.py", sf_dir, str(tmp_path / "out")])
    # 13 actions: 3 declared sinks (codes write + 2 collects) + 1 persisted
    # fan-out (dedup→3) + 4 k-means fit (init sample + 3 Lloyd rounds) +
    # 5 PQ codebook fit (documented codebook contracts)
    with job_budget("embedding_pipeline", 30), action_audit("embedding_pipeline", 13):
        assert embedding_pipeline.main() == 0
    out = capsys.readouterr().out
    assert "clusters: 8" in out and "pq codes written" in out
    assert (tmp_path / "out" / "pq_codes").exists()


def test_streaming_ingest_example(spark, sf_dir, monkeypatch, capsys, tmp_path, job_budget):
    import streaming_ingest

    monkeypatch.setattr(sys, "argv", ["streaming_ingest.py", sf_dir, str(tmp_path / "out")])
    with job_budget("streaming_ingest", 20):
        assert streaming_ingest.main() == 0
    out = capsys.readouterr().out
    # the re-crawled duplicates must be rejected by the fingerprint store:
    # admitted equals the distinct source docs, not source + 20
    m_src = int(out.split("source docs: ")[1].split(" ")[0])
    m_adm = int(out.split("admitted (store-deduped): ")[1].split("\n")[0])
    assert m_adm <= m_src
    assert (tmp_path / "out" / "chunks").exists()


def test_experiment_pipeline_example(spark, sf_dir, job_budget, action_audit):
    import experiment_pipeline

    # 5 actions: 3 declared sinks (attribution count, readout collect,
    # transition count) + quality-gate collect + 1 persisted fan-out
    with job_budget("experiment_pipeline", 12), action_audit("experiment_pipeline", 5):
        out = experiment_pipeline.main(sf_dir)
    assert out["attributions"] > 0
    assert out["transitions"] > 0
    ro = out["readout"]
    assert {ro["group_a"], ro["group_b"]} == {"A", "B"}
    assert ro["n_a"] > 0 and ro["n_b"] > 0 and ro["std_err"] is not None


def test_experiment_pipeline_gate_aborts_on_bad_batch(spark):
    from pyspark.sql import functions as F

    import experiment_pipeline

    bad = spark.createDataFrame(
        [(1, 1, "view"), (1, 2, "view")], "event_id bigint, user_id bigint, event_type string"
    ).withColumn("ts", F.lit(None).cast("timestamp"))
    import pytest

    with pytest.raises(RuntimeError, match="quality gate failed"):
        experiment_pipeline.gated(bad)


def test_incremental_refresh_example(spark, sf_dir, tmp_path, job_budget, action_audit):
    import incremental_refresh

    out = str(tmp_path / "refresh")
    # 8 actions: per-batch delta-dedup admit + shard writes + the manifest
    # collect (declared ingest-loop contract; see the example's docstring)
    with job_budget("incremental_refresh", 80), action_audit("incremental_refresh", 8):
        res = incremental_refresh.main(sf_dir, out)
    import glob

    dirs = glob.glob(os.path.join(out, "shards", "shard=*"))
    assert dirs and len(dirs) == len(res["manifest"])
    total = sum(n for _, n, _ in res["manifest"])
    got = spark.read.parquet(os.path.join(out, "shards"))
    assert got.count() == total
    # admitted batch never collides with the kept corpus at the LSH level:
    # rerunning the delta dedup over the merged corpus must admit everything
    from pyspark.sql import functions as F

    from pipes_spark.operators.dedup import _minhash_wide, minhash_lsh_pairs_delta

    merged = got.select("doc_id", "text")
    sigs = _minhash_wide(merged, "doc_id", "text", 64, 3)
    new_ids = merged.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    residual = minhash_lsh_pairs_delta(sigs, new_ids, threshold=0.5)
    assert residual.isEmpty()


def test_inference_lab_example(spark, sf_dir, job_budget, action_audit):
    import inference_lab

    # 5 actions: 4 declared readout sinks + 1 persisted fan-out (scan→4)
    with job_budget("inference_lab", 8), action_audit("inference_lab", 5):
        out = inference_lab.main(sf_dir)
    assert set(out) == {"anova", "tukey", "kruskal", "power"}
    anova = out["anova"][0]
    assert anova["n_groups"] == 5 and anova["f_stat"] is not None
    assert len(out["tukey"]) == 10  # C(5,2) pairs
    assert out["kruskal"][0]["df"] == 4
    # power rows are MDE-monotone
    ns = [r["n_per_arm"] for r in sorted(out["power"], key=lambda r: r["mde_frac"])]
    assert ns == sorted(ns, reverse=True)


def test_data_mixing_example(spark, sf_dir, tmp_path, monkeypatch, capsys, job_budget, action_audit):
    import data_mixing

    out = str(tmp_path / "mix")
    monkeypatch.setattr(sys, "argv", ["data_mixing.py", sf_dir, out])
    # 4 actions: 3 declared sinks (shards write, manifest collect,
    # readout collect) + 1 persisted fan-out (mix→3)
    with job_budget("data_mixing", 40), action_audit("data_mixing", 4):
        assert data_mixing.main() == 0
    txt = capsys.readouterr().out
    assert "mixed corpus:" in txt
    # the export is verifiable: manifest row counts equal what was written
    got = spark.read.parquet(os.path.join(out, "shards"))
    n = int(txt.split("mixed corpus: ")[1].split(" ")[0])
    assert got.count() == n > 0
    # deterministic mixing: every language retained, none dominates the
    # α=0.5 temperature mix by more than the natural-proportion ratio
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs == {"de", "en", "es", "fr", "zh"}


def test_search_lab_example(spark, sf_dir, job_budget, action_audit):
    import search_lab

    # 5 actions: 3 declared readout sinks + 2 persisted fan-outs
    # (docs→{postings, bm25}, postings→{phrase, near})
    with job_budget("search_lab", 16), action_audit("search_lab", 5):
        out = search_lab.main(sf_dir)
    assert set(out) == {"phrase", "near", "bm25"}
    assert len(out["bm25"]) == 10
    scores = [r["bm25"] for r in out["bm25"]]
    assert scores == sorted(scores, reverse=True)
    assert len(out["phrase"]) > 0 and len(out["near"]) > 0
    # spot-verify one phrase hit against the raw text (distinct tokens ⇒
    # occurrences are non-overlapping token windows)
    hit = out["phrase"][0]
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(f"doc_id = {hit['doc_id']}")
        .first()["text"]
    )
    toks = [t for t in text.lower().split() if t]
    n = sum(
        1 for i in range(len(toks) - 1) if toks[i : i + 2] == ["table", "scan"]
    )
    assert n == hit["n_occurrences"]


def test_survival_report_example(spark, sf_dir, job_budget, action_audit):
    import survival_report

    # 4 actions: 3 declared readout sinks + 1 persisted fan-out
    # (durations → KM / NA / logrank)
    with job_budget("survival_report", 10), action_audit("survival_report", 4):
        out = survival_report.main(sf_dir)
    assert set(out) == {"km", "na", "logrank"}
    km, na = out["km"], out["na"]
    assert len(km) == len(na)  # same distinct-duration domain
    # survival is non-increasing in duration, hazard non-decreasing
    surv = [float(r["survival"]) for r in km]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    haz = [float(r["cum_hazard"]) for r in na]
    assert all(a <= b for a, b in zip(haz, haz[1:]))
    # risk set starts at the cohort size and shrinks to the last subject
    assert km[0]["n_risk"] == sum(r["n_events"] + r["n_censored"] for r in km)
    assert km[-1]["n_risk"] >= 1
    lr = out["logrank"][0]
    assert lr["n1"] + lr["n0"] == km[0]["n_risk"]
    assert lr["chi2"] is not None and lr["chi2"] >= 0.0


def test_privacy_audit_example(spark, sf_dir, job_budget, action_audit):
    import privacy_audit

    # 4 actions: 3 audit sinks + 1 persisted fan-out (scan→3)
    with job_budget("privacy_audit", 8), action_audit("privacy_audit", 4):
        out = privacy_audit.main(sf_dir)
    assert set(out) == {"k_anon", "l_div", "t_close"}
    # t-closeness reports EVERY group with a flag; the other two are
    # violation-bounded
    assert len(out["t_close"]) == 5
    assert {r["o_orderpriority"] for r in out["t_close"]} == {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
    }
    assert all(r["emd"] is not None for r in out["t_close"])
    for r in out["l_div"]:
        assert r["distinct_l"] < 3
    for r in out["k_anon"]:
        assert r["n_rows"] < 5


def test_media_pipeline_example(spark, sf_dir, monkeypatch, job_budget, action_audit):
    import media_pipeline

    monkeypatch.setattr(sys, "argv", ["media_pipeline.py", sf_dir])
    # 1 action: the report collect (the manifest fan-out feeds three
    # branches but they converge on ONE sink, so the single-pass
    # fan-out persist is skipped — sink_users == 1)
    with job_budget("media_pipeline", 40), action_audit("media_pipeline", 1):
        got: dict = {}
        media_pipeline.build(spark, sf_dir, got).build().start().done()
    report = got["report"]
    assert set(report) == {"image", "audio", "video"}
    n_docs = report["image"]["n_assets"]
    assert report["audio"]["n_assets"] == n_docs
    assert report["video"]["n_assets"] == n_docs
    assert all(r["total_checksum"] > 0 for r in report.values())
