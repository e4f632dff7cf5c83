"""Generate SCALING.md: measured per-query scaling across SFs.

Joins the three full-registry bench artifacts (sf0.001 / sf0.01 /
sf0.1 — each produced by ``bench.py`` on an otherwise-idle machine)
and reports, per query, the wall-time ratio across each 10x data
step. This is the measured answer to "would this plan survive a
scale-up": a query whose time grows far faster than its input across
BOTH steps has a super-linear stage (n^2 pair loop, global sort,
driver collect) — at local[32] bench scale most queries are
scheduling-overhead-bound instead, which shows up as ratios near 1.

Table row counts are NOT uniform 10x per step (documents/embeddings
grow slower than lineitem/events in the driver's testdata), so the
report carries per-table row counts and each query's growth is read
against the tables it scans. Run:

    python tools/scaling_report.py   # writes SCALING.md
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = {
    "sf0.001": "BENCH_FULL_sf0.001.json",
    "sf0.01": "BENCH_FULL_sf0.01.json",
    "sf0.1": "BENCH_FULL.json",
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


import sys

# Testdata root: CLI arg > env var > the driver's default location.
TESTDATA_ROOT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
)


def _table_counts() -> dict[str, dict[str, int]]:
    import duckdb

    out: dict[str, dict[str, int]] = {}
    con = duckdb.connect()
    for sf in ARTIFACTS:
        d = os.path.join(TESTDATA_ROOT, sf)
        out[sf] = {
            t: con.execute(
                f"SELECT COUNT(*) FROM '{d}/{t}.parquet'"
            ).fetchone()[0]
            for t in TABLES
            if os.path.exists(f"{d}/{t}.parquet")
        }
        if not out[sf]:
            print(
                f"warning: no parquet tables under {d} — row-count "
                "table will be empty (set SPARK_GRAFT_TESTDATA_ROOT "
                "or pass the root as argv[1])",
                file=sys.stderr,
            )
    return out


def main() -> None:
    data = {}
    for sf, fn in ARTIFACTS.items():
        with open(os.path.join(ROOT, fn)) as f:
            data[sf] = json.load(f)["queries"]
    names = sorted(set(data["sf0.001"]) & set(data["sf0.01"]) & set(data["sf0.1"]))
    counts = _table_counts()

    rows = []
    for n in names:
        a, b, c = data["sf0.001"][n], data["sf0.01"][n], data["sf0.1"][n]
        r1 = b / a if a else float("inf")
        r2 = c / b if b else float("inf")
        rows.append((n, a, b, c, r1, r2))

    # growth classification on the LAST step (the one with real data
    # volume); the earlier step is almost pure fixed overhead
    overhead = [r for r in rows if r[3] < 1.5 * r[1]]
    superlin = [r for r in rows if r[5] > 12.0]

    lines = [
        "# SCALING — measured wall time across scale factors",
        "",
        "Full-registry `bench.py` runs (best-of-2 per query, idle",
        "machine, one JVM per SF) at the three driver SFs. Ratios are",
        "t(next SF) / t(this SF) for each 10x data step. At these",
        "sizes Spark's per-query floor (~0.2-0.4 s of planning +",
        "scheduling on local[32]) dominates most queries — a ratio",
        "near 1 means overhead-bound, NOT zero marginal cost; the",
        "per-row cost only becomes visible where the plan does real",
        "volume work (dedup pair stages, LDA fits, codec decode,",
        "streaming drains).",
        "",
        "Host-level contention on this shared machine arrives in",
        "multi-minute windows that can cover a query's both",
        "executions, so single runs carry a few arbitrary 3-10x",
        "victims; the sf0.1 column is the per-query min across",
        "multiple full same-code runs (tools/bench_merge.py; run",
        "count and provenance",
        "stamped in BENCH_FULL.json), and since round 12 the",
        "small-SF columns are min-merged the same way (runs",
        "stamped in BENCH_FULL_sf*.json) — read sub-1.0x step",
        "ratios as that noise, not",
        "as negative marginal cost.",
        "",
        "## Table row counts (driver testdata is not uniform 10x)",
        "",
        "| table | " + " | ".join(ARTIFACTS) + " |",
        "|---|" + "---|" * len(ARTIFACTS),
    ]
    for t in TABLES:
        if all(t in counts[sf] for sf in ARTIFACTS):
            lines.append(
                f"| {t} | "
                + " | ".join(str(counts[sf][t]) for sf in ARTIFACTS)
                + " |"
            )
    total_each = {sf: sum(data[sf].values()) for sf in ARTIFACTS}
    lines += [
        "",
        "## Summary",
        "",
        f"- {len(names)} queries benched at all three SFs; suite totals: "
        + ", ".join(f"{sf} = {total_each[sf]:.1f}s" for sf in ARTIFACTS)
        + ".",
        f"- {len(overhead)} queries are overhead-bound end to end "
        "(sf0.1 < 1.5x sf0.001 despite 100x data) — their scale "
        "behavior is governed by the plan shape audited in PLANS.md, "
        "not by anything measurable at bench volume.",
        f"- {len(superlin)} queries grew >12x over the last 10x step "
        "(flagged below with the structural reason).",
        "",
        "## Flagged (>12x growth on the sf0.01 -> sf0.1 step)",
        "",
    ]
    if superlin:
        lines.append("| query | sf0.01 (s) | sf0.1 (s) | ratio |")
        lines.append("|---|---|---|---|")
        for n, a, b, c, r1, r2 in sorted(superlin, key=lambda r: -r[5]):
            lines.append(f"| {n} | {b:.2f} | {c:.2f} | {r2:.1f}x |")
    else:
        lines.append("(none)")
    lines += [
        "",
        "## Per-query times and step ratios",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | x10 step 1 | x10 step 2 |",
        "|---|---|---|---|---|---|",
    ]
    for n, a, b, c, r1, r2 in sorted(rows, key=lambda r: -r[3]):
        lines.append(
            f"| {n} | {a:.2f} | {b:.2f} | {c:.2f} | {r1:.2f}x | {r2:.2f}x |"
        )

    # Optional sf1 heavy-tail rehearsal (tools/make_sf1.py +
    # tools/bench_subset.py -> BENCH_SF1.json): one genuinely
    # volume-bound 10x step for the queries whose sf0.1 time is
    # dominated by real work rather than the scheduling floor.
    sf1_path = os.path.join(ROOT, "BENCH_SF1.json")
    if os.path.exists(sf1_path):
        with open(sf1_path) as f:
            sf1 = json.load(f)
        lines += [
            "",
            "## sf1 rehearsal (generated data, tools/make_sf1.py) — "
            "FULL registry since round 12",
            "",
            "10x replication of sf0.1 (key-offset shards, "
            "token-rotated text — NOT exact copies, so dedup-family "
            "output grows linearly like a real corpus). Subset runs "
            "via tools/bench_subset.py, best-of-2, local[32]/32 "
            "shuffle partitions; the sf0.1 reference is the "
            "min-merged BENCH_FULL floor, so ratios here are "
            "conservative (min-of-N vs best-of-2).",
            "",
            "| query | sf0.1 floor (s) | sf1 (s) | x10 step |",
            "|---|---|---|---|",
        ]
        floors = data["sf0.1"]
        flagged_sf1 = []
        for n, t in sorted(
            sf1["queries"].items(), key=lambda kv: -kv[1]
        ):
            fl = floors.get(n)
            if fl:
                ratio = t / fl
                lines.append(f"| {n} | {fl:.2f} | {t:.2f} | {ratio:.1f}x |")
                if ratio > 12.0:
                    flagged_sf1.append(n)
            else:
                lines.append(f"| {n} | (new this round) | {t:.2f} | — |")
        notes = sf1.get("notes", {})
        if flagged_sf1 or notes:
            lines += ["", "Flagged / explained:", ""]
            for n in sorted(set(flagged_sf1) | set(notes)):
                lines.append(f"- **{n}**: {notes.get(n, '>12x, unexplained')}")

    with open(os.path.join(ROOT, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"SCALING.md written: {len(names)} queries, "
          f"{len(superlin)} flagged, {len(overhead)} overhead-bound")


if __name__ == "__main__":
    main()
