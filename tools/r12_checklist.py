#!/usr/bin/env python
"""Generate the OPTIMIZATION_r12.md per-query checklist: every benched
path with its session before/after MIN and r12 status. Inputs are the
committed session bench JSONs (no Spark)."""

import json

BEFORE = json.load(open("BENCH_LOCAL_r12_before.json"))
# final-code passes only: the back-to-back clean close pair (steal
# 1.061 / 1.038); earlier session passes predate the last code change
AFTERS = [json.load(open("BENCH_LOCAL_r12_close.json"))]

# status tags: item numbers refer to OPTIMIZATION_r12.md work-log sections
STATUS = {
    "q21_waiting_supplier": "TOUCHED #1 (one fact scan, 3 exchanges)",
    "dedup_prefix_doubling": "TOUCHED #2+#9 (dup-grams filter -> window flag); tail decomposed, at 2-exchange floor",
    "sim_cosine_topk": "EXAMINED #3 (literal broadcast A/B REJECTED 0.587 vs 0.817; documented in catalog)",
    "text_kn_perplexity_indexed": "TOUCHED #4 (lp windows, BuildLeft fix); model-shuffle trade adjudicated (left-alone list)",
    "streaming_events_hourly": "TOUCHED #5 (RocksDB changelog); batch count already 1 (probe)",
    "streaming_stateful_totals": "TOUCHED #5 (RocksDB changelog); addBatch 813ms of 1076ms = engine floor",
    "multimodal_cross_codec_ahash": "TOUCHED #6 (np.add.reduceat pooling, 5.6x kernel)",
    "multimodal_gif_roundtrip": "TOUCHED #7 (int-keyed LZW, 2.3x kernel) + #11",
    "multimodal_tiff_roundtrip": "TOUCHED #7 (int-keyed LZW, 2.4x kernel) + #11",
    "dedup_lsh_verified": "TOUCHED #8 (cand persist + spread verify scan) + #11; persist re-A/B'd 1.04 vs 1.65",
    "source_avro_roundtrip": "TOUCHED #10 (register memoized, explicit schema)",
    "source_avro_snappy_roundtrip": "TOUCHED #10",
    "source_avro_evolution": "TOUCHED #10",
    "q1_pricing_summary": "TOUCHED #11 (probe -> byte estimate); plan canonical (left-alone list)",
    "events_hourly": "TOUCHED #11",
    "sim_ivf_topk": "TOUCHED #12 (nearest UDF double-eval fixed: 2 -> 1 python stages) + #11",
    "sim_ivfpq_indexed": "TOUCHED #12 (_enc struct double-eval fixed at encode path) + #11",
    "sim_ivf_indexed": "TOUCHED #11 (construct probes removed)",
    "sim_quantized_topk": "TOUCHED #11",
    "sim_lsh_topk": "TOUCHED #11; at multi-stage floor (2000-row corpus)",
    "sim_cosine_neardup": "TOUCHED #11 (auto src_bytes); r11 in-kernel verify retained",
    "dedup_minhash_lsh": "TOUCHED #11; CLAUDE.md-pinned bucket-cap shape respected",
    "dedup_simhash": "TOUCHED #11",
    "dedup_keyed": "EXAMINED: single window+filter, at floor",
    "text_tfidf": "EXAMINED: r11 shared-branch persist retained (A/B'd there)",
    "text_quality": "TOUCHED #11 (via text op internals)",
    "text_phrase_indexed": "TOUCHED #11; postings read already exchange-free",
    "udf_grouped_zscore": "EXAMINED: applyInPandas contract, at floor (r11 ratio ~1)",
    "sketch_theta_diff": "EXAMINED: r11 no-persist/AQE-reuse shape re-confirmed; swings track steal",
}
# the 22 remaining codec round trips + exif + wav etc. all share #11
CODEC_NOTE = "TOUCHED #11 (presort partition floor from byte estimate; kernels r11-optimized)"
FLOOR_NOTE = "EXAMINED: at fixed-latency floor (r11 8-core ratio ~1, sub-0.5s)"

rows = []
for sec in ("queries", "queries_ext"):
    for k, v in BEFORE.get(sec, {}).items():
        after = min(
            (a.get(sec, {}).get(k) for a in AFTERS if a.get(sec, {}).get(k)),
            default=None,
        )
        st = STATUS.get(k)
        if st is None:
            st = CODEC_NOTE if k.startswith(("multimodal_", "source_")) else FLOOR_NOTE
        rows.append((k, v, after, st))

print("| query | session-before MIN (r11-close code) | r12-close MIN (clean pair) | r12 status |")
print("|---|---|---|---|")
for k, v, a, st in rows:
    print(f"| {k} | {v} | {a} | {st} |")
