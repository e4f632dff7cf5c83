"""Emit EVIDENCE.json: per-query driver-evidence age.

Scans every CORRECTNESS_r*.json the driver has recorded and writes,
for each query name ever checked, the LATEST round in which its row
was green (hash-match against the DuckDB oracle, or the weaker
rows-only check for non-SQL ops). This is the single source of truth
the per-round window rotation reads — the 50-slot driver window in
``queries.py`` should always lead with the smallest rounds listed
here — so neither the builder nor the judge re-derives evidence ages
from the raw artifacts each round.

    python tools/evidence_manifest.py   # writes EVIDENCE.json
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _is_green(res: object) -> bool:
    if isinstance(res, dict):
        for key in ("match", "ok", "pass"):
            if key in res:
                return bool(res[key])
        # No recognized key: only trust an all-true set of boolean
        # fields; an error-shaped row with no booleans is NOT green
        # (all() over an empty generator would be True).
        vals = [v for v in res.values() if isinstance(v, bool)]
        return bool(vals) and all(vals)
    return bool(res)


def main() -> None:
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        rounds.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if _is_green(res):
                latest[name] = max(rnd, latest.get(name, 0))
    by_round: dict[str, int] = {}
    for rnd in sorted(set(latest.values())):
        by_round[f"r{rnd}"] = sum(1 for v in latest.values() if v == rnd)
    out = {
        "rounds_scanned": rounds,
        "n_queries": len(latest),
        "min_evidence_round": min(latest.values()) if latest else None,
        "distribution": by_round,
        "latest_green_round": dict(sorted(latest.items())),
    }
    with open(os.path.join(ROOT, "EVIDENCE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        f"EVIDENCE.json: {len(latest)} queries, min round "
        f"{out['min_evidence_round']}, distribution {by_round}"
    )


if __name__ == "__main__":
    main()
