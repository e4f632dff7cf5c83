"""Round-13-close floor fold: min-merge with plan-change awareness.

``tools/bench_merge.py`` min-merges artifacts of IDENTICAL code. This
round changed the plans of 37 queries, so their committed floors
(measured on the pre-r13 plans) may not be min-merged forward — a min
across different plans would attribute the old plan's time to the new
one (the r12 ``dedup_ngram_jaccard`` precedent: rebuild, don't
min-merge, across plan changes). This wrapper:

1. strips the r13-CHANGED queries out of the committed artifact, and
2. hands the stripped artifact plus the round-close runs (identical
   final-HEAD code) to ``bench_merge.py``.

Result: unchanged queries keep their deep (runs: N) floors and can
only improve; changed queries get floors rebuilt from this round's
runs only. The changed list mirrors OPTIMIZATION_r13.md and the
r13 commit set (every registry fn reading a changed operator or
helper, transitively).

    python tools/fold_r13_floors.py out.json committed.json run1.json [run2.json ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

# every queries() entry whose physical plan changed in round 13
R13_CHANGED = {
    # CF / butterfly family (48ae85f, c9f1e29, 178e4e5, eaf09e7)
    "item_item_recs_topk", "item_item_recs_pruned", "item_item_recs_dimsum",
    "butterfly_counts_sampled", "butterfly_counts_bipartite",
    # kNN-edge consumers (4cb55d9, 98c8d95)
    "community_detection_suppliers", "community_modularity",
    "graph_random_walks", "node2vec_biased_walks",
    "skipgram_negative_samples", "walk_skipgram_pmi",
    "pmi_embedding_vectors", "embedding_edge_recall",
    # strong-tie-cut consumers (4cb55d9)
    "triangle_count_suppliers", "kcore_suppliers", "degree_assortativity",
    # other graph (4cb55d9, 68550c0, b022865)
    "link_prediction_suppliers", "shortest_paths_suppliers",
    "hits_copurchase",
    # kernels (dc2790e, b3072a0)
    "kmeans_lloyd_embeddings", "dedup_cc_clusters",
    "dedup_minhash_clusters", "fuzzy_entity_clusters",
    # LDA family (c27e651, 23d82c6)
    "lda_topics", "m3_coherence_umass", "m3_coherence_cv",
    # suffix family (c27e651)
    "suffix_array_spans", "suffix_span_removal",
    "exact_substr_contamination",
    # streaming (23d82c6, b3072a0)
    "streaming_image_decode", "streaming_kmv_setops",
    # NB family + gauntlets (b3072a0, 5fe61a6)
    "nb_lang_confusion", "nb_lang_confusion_hashed", "nb_kfold_eval",
    "gopher_repetition_flags", "c4_quality_flags",
    "quality_filter_agreement",
    # misc (9c20319)
    "poisson_bootstrap_ci",
}


def main() -> None:
    out_path, committed_path, *run_paths = sys.argv[1:]
    if not run_paths:
        raise SystemExit("need the committed artifact plus >= 1 run")
    with open(committed_path) as f:
        committed = json.load(f)
    kept = {
        k: v for k, v in committed["queries"].items() if k not in R13_CHANGED
    }
    stripped = dict(committed, queries=kept)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as tmp:
        json.dump(stripped, tmp)
        tmp_path = tmp.name
    try:
        tool = os.path.join(os.path.dirname(__file__), "bench_merge.py")
        subprocess.run(
            [sys.executable, tool, out_path, tmp_path, *run_paths],
            check=True,
        )
    finally:
        os.unlink(tmp_path)
    with open(out_path) as f:
        merged = json.load(f)
    merged["rebuilt_r13"] = sorted(R13_CHANGED)
    merged["note"] = (
        "r13 fold: unchanged queries min-merge the committed floors; "
        "the rebuilt_r13 queries' plans changed this round, so their "
        "floors are min over this round's runs only"
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"folded {len(merged['queries'])} queries "
        f"({len(R13_CHANGED)} rebuilt) -> {out_path}"
    )


if __name__ == "__main__":
    main()
