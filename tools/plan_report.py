"""Generate PLANS.md: executed physical plans of the headline queries.

Evidence artifact for scale review — each section shows the AQE-final plan
with the properties that matter at 100 TB called out (pushdown reaching the
scan, broadcast joins on dimensions, single-exchange window blocks, no
partitionless windows, exchange reuse). Regenerate with:

    python tools/plan_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_big_data_spark.queries import REGISTRY  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.01"

# query -> the scale property its plan demonstrates
SHOWCASE = {
    "pricing_summary": (
        "Filter + column pruning reach the parquet scan (PushedFilters / "
        "ReadSchema); aggregation is partial (map-side combine) before one "
        "exchange on the group keys."
    ),
    "nation_revenue": (
        "TPC-H Q5 star join: every dimension side is a BroadcastHashJoin — "
        "lineitem (the only fact) is never shuffled for the joins, only for "
        "the final aggregation."
    ),
    "ev_rolling": (
        "The whole window-feature block (lag/rolling over 24 rows) runs in "
        "ONE exchange on the series key; all window functions share the "
        "sort."
    ),
    "ev_zscore": (
        "Global max-|x| via broadcast crossJoin of a 1-row aggregate — NOT "
        "a partitionless window (which would single-partition the fact "
        "table); the per-user z-score windows stay keyed."
    ),
    "ev_regime_distribution": (
        "Share-of-total: the grouped branch is ReusedExchange — the regime "
        "pipeline is computed once, not once per branch."
    ),
    "doc_near_dup_lsh": (
        "LSH near-dup: banded equi-join on (band, key) generates "
        "candidates — no cartesian anywhere; rescoring joins candidates "
        "only. Round 11: per-bucket membership is bucket_cap-bounded "
        "(row_number over the banded table, pinned once in memory for its "
        "four consumers) with overflow star-linked to the bucket "
        "representative — hot buckets cost cap² + linear overflow, never B²."
    ),
    "emb_topk": (
        "ANN brute-force baseline: the probe set broadcasts; the corpus "
        "pass is shuffle-free until the tiny per-query top-k aggregation."
    ),
    "ev_sessions": (
        "Sessionization (gaps-and-islands): one exchange on the series key "
        "serves the lag, the cumulative flag and the session aggregation."
    ),
    "doc_contamination": (
        "Benchmark contamination: the benchmark gram set reduces to "
        "broadcast 64-bit hashes; the corpus-side gram pass joins it "
        "BroadcastHashJoin (no corpus shuffle beyond the shingle window) "
        "and one hash aggregate yields totals + matches together."
    ),
    "doc_packing": (
        "Context packing: pack ids come from the two-phase global running "
        "sum — range-bucketed parallel window cumsums plus broadcast "
        "prefix offsets; NO partitionless (global ORDER BY) window "
        "anywhere in the plan."
    ),
    "doc_quality_flags": (
        "Repetition/quality metrics are pure Column expressions: the ONLY "
        "exchange is the round-robin spread of a small input (no-op-sized "
        "at scale) — no key shuffle, no explode, nothing but map work."
    ),
    "doc_tfidf_topk": (
        "TF shuffle on (doc, term) with map-side partial aggregation "
        "absorbing stopword skew; the vocabulary-sized DF side joins "
        "broadcast under AQE; the rank window partitions by doc only — "
        "no global sort."
    ),
    "doc_dup_clusters": (
        "Iterative min-label connected components runs on the NEAR-DUP "
        "PAIR graph (banded LSH output), orders of magnitude smaller than "
        "the corpus — the corpus itself is touched once, by the LSH "
        "pipeline."
    ),
    "doc_incremental_dedup": (
        "Batch-vs-corpus dedup: the curated corpus enters as a DISTINCT "
        "fingerprint set only; the anti-join keys are md5 fingerprints — "
        "uniform by construction, so the shuffle cannot skew however "
        "skewed the raw text is."
    ),
    "doc_simhash_pairs": (
        "SimHash hamming near-dup: candidates come from an equi-join on "
        "(band, 12-bit band value) — exact by pigeonhole for hamming ≤ 3 "
        "with 4 bands, so NO all-pairs comparison exists in the plan; one "
        "JVM-side bit_count(xor) verifies each candidate once (distinct "
        "collapses multi-band hits before rescoring)."
    ),
    "doc_chunks": (
        "Sliding-window chunking is map-only: tokenize → per-row sequence "
        "of window starts → explode → slice/array_join. ZERO exchanges — "
        "output volume (chunk/stride × input) is the only cost, inherent "
        "to overlapped chunking, not the plan."
    ),
    "doc_interleave": (
        "Weighted source interleave: per-source ranks come from KEYED "
        "windows (partitionBy source); the global weighted-fair-queueing "
        "position comes from the two-phase running count (range-bucketed "
        "parallel windows + broadcast offsets) — NO partitionless ORDER "
        "BY window assigns corpus-wide positions."
    ),
    "ev_time_rollup": (
        "Hierarchical time rollup: the fact is aggregated once at hour "
        "grain; day and week REAGGREGATE the level below via mergeable "
        "stats — at runtime AQE stage reuse turns the union's shared "
        "sublevels into ReusedExchange, so three granularities cost one "
        "fact scan + two tiny aggregations."
    ),
    "ev_range_join": (
        "Range (interval) join: the theta predicate is rewritten as a "
        "bucketized EQUI-join — facts carry one hour-bucket id, intervals "
        "explode to their overlapped buckets — so Catalyst plans a "
        "shuffled hash join, NOT the BroadcastNestedLoopJoin a raw "
        "BETWEEN join forces; the exact predicate filters after the join."
    ),
    "ev_cohort": (
        "Cohort retention: two keyed aggregations (first-seen day, "
        "distinct activity days) and one user-keyed join — the result is "
        "days²-bounded however large the event volume; no window, no "
        "global sort."
    ),
    "doc_top_ngrams": (
        "Corpus boilerplate n-grams: shingle window (one doc-key exchange) "
        "→ distinct → ngram-keyed count with map-side partial aggregation "
        "→ global top-k via TakeOrderedAndProject (per-partition heaps, "
        "k-sized driver merge — no global sort); the rank window orders "
        "only the ≤ k surviving rows."
    ),
    "ev_hll_users": (
        "HyperLogLog registers build in ONE partial-aggregatable exchange "
        "on (group, bucket) — map-side combine caps in-flight state at "
        "2^b rows per group per partition regardless of input size; the "
        "estimate is a second tiny aggregate over ≤ 2^b rows per group."
    ),
    "large_order_customers": (
        "TPC-H Q18 shape: the lineitem HAVING-aggregate runs BEFORE any "
        "join (only qualifying orders reach the probe side), customer is "
        "a BroadcastHashJoin, and the top-20 is TakeOrderedAndProject — "
        "per-partition heaps, k-row merge, no global sort."
    ),
    "brand_small_qty_revenue": (
        "TPC-H Q17 shape: the correlated scalar subquery is an aggregate "
        "join — the brand filter broadcasts FIRST so both the threshold "
        "aggregate and the probe side shrink to the brand's rows before "
        "any shuffle; the threshold join is keyed on the part key."
    ),
    "ev_cms_counts": (
        "Count-min sketch: the depth×width counter grid builds in one "
        "partial-aggregatable shuffle on (row, slot) — bounded state "
        "regardless of distinct-key count; the probe side explodes to "
        "depth rows and joins the grid on the bounded slot key."
    ),
    "doc_normalized": (
        "Unicode ingest normalization: ONE map-only pass — the NFC step "
        "is an Arrow-batched pandas UDF (ArrowEvalPython, the sanctioned "
        "vectorized boundary, never row-at-a-time Python), everything "
        "else (control strip, whitespace collapse, md5) stays in "
        "whole-stage codegen. No exchange anywhere."
    ),
    "doc_span_dedup": (
        "Exact-substring (duplicated-span) dedup, size-routed on span "
        "width: narrow spans (the registry's k=10) hash via one keyed "
        "lead-fan window pass; wide spans switch to an O(n) two-prime "
        "polynomial rolling hash (narrow cumsum window + one lead, modpow "
        "via constant-folded digit tables) with exact verification on "
        "candidate spans only (cost bounded by duplicate mass) — measured "
        "crossover ≈ 80 tokens at sf0.1, lower at cluster scale. Winners "
        "come from ONE aggregate (min struct), never a self-join; "
        "reassembly is sort_array inside the group aggregate — no "
        "order-by window, no suffix array."
    ),
    "ev_regime_sketch": (
        "Sketch-routed F8 thresholds: the bottom-k sample ranks inside "
        "the keyed (series) window, sample percentiles aggregate 128 "
        "rows/series, and the label join-back broadcasts — the full "
        "history never sorts."
    ),
    "nation_trade_volume": (
        "TPC-H Q7 shape: every dimension map (supplier/customer/nation) "
        "broadcasts; the only fact-sized shuffle is lineitem↔orders on "
        "the order key; the cross-nation predicate is a filter on "
        "broadcast attributes, not a cartesian."
    ),
    "sole_blame_suppliers": (
        "TPC-H Q21 shape: the EXISTS is a LeftSemi hash join on the "
        "uniform order key; the NOT-EXISTS collapsed to a count==1 "
        "aggregate + second LeftSemi (one shuffle fewer than the "
        "self-join form — the oracle keeps literal NOT EXISTS, so the "
        "equivalence is hash-checked); final top-10 is a "
        "TakeOrderedAndProject k-row merge."
    ),
    "idle_rich_customers": (
        "TPC-H Q22 shape: the scalar average is a broadcast 1-row "
        "aggregate (never a partitionless window), NOT EXISTS is a "
        "left-anti join on the uniform customer key, and the orders side "
        "is pruned to its join column at the scan (ReadSchema)."
    ),
    "emb_semdedup": (
        "SemDeDup: centroid assignment is MAP-ONLY — the seed set folds "
        "over one in-plan literal (no join, no exchange, no row blowup); "
        "the first shuffle is the per-cluster rank window, the prune "
        "join reuses that cluster partitioning, and the quadratic stage "
        "is confined to one cluster."
    ),
    "emb_lloyd_kmeans": (
        "Relational Lloyd: per round, assignment folds over the in-plan "
        "centroid literal (map-only) and the update is one k-row hash "
        "aggregate — the corpus is NEVER reshuffled across iterations, "
        "mirroring MLlib KMeans' own shape."
    ),
    "doc_stratified_split": (
        "Exact-proportion stratified split: per-stratum ranks come from "
        "256 hash-prefix buckets (local row_number + broadcast frozen "
        "prefix offsets) — strata×256 parallel window tasks instead of "
        "one task per stratum."
    ),
    "emb_pq_adc": (
        "PQ/ADC: encode is a broadcast codebook join + min_by per "
        "(id, subspace) with one regroup on the uniform id; the ADC scan "
        "reads 8-byte code arrays (not 3 KB vectors) against broadcast "
        "per-query LUTs — whole-stage-codegen arithmetic, top-10 per "
        "probe via a keyed rank window."
    ),
    "emb_ivf_seeded": (
        "IVF routing: the bounded centroid table broadcasts for both "
        "cell assignment (min-struct aggregate, map-side combined) and "
        "probe ranking; the candidate scan is the keyed cell equi-join — "
        "~(n_probe/n_cells) of the corpus read per query, never all of "
        "it."
    ),
    "emb_pca_power": (
        "Power-iteration PCA: two keyed distributed passes (per-dim "
        "means, dim-pair scatter aggregate), driver matvec rounds on the "
        "bounded d² matrix, one distributed projection pass against the "
        "broadcast component — nothing row-sized reaches the driver."
    ),
}


def main() -> None:
    spark = build_session("plan_report")
    out = [
        "# PLANS — executed physical plans of the headline queries\n",
        "Generated by `python tools/plan_report.py` at sf0.01 (plans are "
        "scale-invariant in shape; AQE-final).\n",
    ]
    for name, why in SHOWCASE.items():
        fn, _ = REGISTRY[name]
        df = fn(spark, SF)
        df.collect()  # finalize the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        # keep the plan readable: AQE-final tree only (drop the pre-AQE
        # initial plan and per-node detail sections)
        tree = plan.split("\n\n")[0].split("+- == Initial Plan ==")[0].rstrip()
        out.append(f"## {name}\n\n{why}\n\n```\n{tree}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
