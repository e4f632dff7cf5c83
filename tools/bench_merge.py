"""Merge multiple full-suite bench artifacts by per-query minimum.

``bench.py`` already takes best-of-2 executions per query inside one
run, which absorbs JIT/GC noise — but host-level contention on this
shared machine arrives in multi-minute windows that cover both
executions, so every full run has a few arbitrary 3-10x victims
(different queries each run: observed prepare_corpus 12.9s vs 4.2s,
pagerank 9.7s vs 2.9s, image_decode 11.4s vs 1.0s across same-code
runs). The per-query min across N full runs of IDENTICAL code is the
standard estimator for the true cost under asymmetric noise — that is
what this tool computes, stamping provenance (``runs``: N) into the
merged artifact so the methodology is visible.

Only merge artifacts produced by the same code revision: a min across
different plans would attribute one revision's time to another's.

    python tools/bench_merge.py out.json in1.json in2.json [...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_groups import (  # noqa: E402
    LEGACY_34, NEW_R5, NEW_R6, NEW_R7, NEW_R7_REST, NEW_R8, NEW_R9,
    NEW_R10, NEW_R11, NEW_R12,
)


def main() -> None:
    out_path, *in_paths = sys.argv[1:]
    if len(in_paths) < 2:
        raise SystemExit("need >= 2 input artifacts")
    arts = []
    for p in in_paths:
        with open(p) as f:
            arts.append(json.load(f))
    for a in arts[1:]:
        if a.get("sf") != arts[0].get("sf"):
            raise SystemExit("artifacts are at different SFs")
    # union of names; min over the artifacts that benched each query
    # (the registry can grow between runs — queries added later exist
    # only in later artifacts; their plans in the earlier runs are
    # identical for every shared query, which the caller must ensure)
    names = set().union(*(a["queries"] for a in arts))
    timings = {
        n: round(min(a["queries"][n] for a in arts if n in a["queries"]), 3)
        for n in sorted(names)
    }

    # Build the artifact ONLY from fields recomputed over the merged
    # timings — never copy an input's derived sub-aggregates forward
    # (they were computed from that single run's raw timings and would
    # contradict the merged per-query values).
    def _group(qnames):
        return round(sum(timings.get(n, 0.0) for n in qnames), 3)

    merged = {
        "metric": arts[-1].get("metric", "headline_queries_total"),
        "unit": arts[-1].get("unit", "sec"),
        "sf": arts[-1].get("sf"),
        "queries": timings,
        "value": round(sum(timings.values()), 3),
        "legacy34_value": _group(LEGACY_34),
        "r5_value": _group(NEW_R5),
        "r6_value": _group(NEW_R6),
        "r7_value": _group(NEW_R7 + NEW_R7_REST),
        "r8_value": _group(NEW_R8),
        "r9_value": _group(NEW_R9),
        "r10_value": _group(NEW_R10),
        "r11_value": _group(NEW_R11),
        "r12_value": _group(NEW_R12),
        "n_queries": len(timings),
        # cumulative run provenance: an input that is itself a merge
        # carries its own ``runs`` count forward
        "runs": sum(a.get("runs", 1) for a in arts),
        "merge": "per-query min across full-suite runs of identical code",
    }
    errors = {k: v for a in arts for k, v in a.get("errors", {}).items()
              if k not in timings}
    if errors:
        merged["errors"] = errors
        merged["n_errors"] = len(errors)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"{out_path}: {len(names)} queries, total {merged['value']}s "
          f"(inputs: {', '.join(str(round(a['value'],1)) + 's' for a in arts)})")


if __name__ == "__main__":
    main()
