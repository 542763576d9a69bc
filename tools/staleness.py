"""Driver-evidence staleness telemetry (VERDICT r9 task #8).

The per-round driver correctness gate samples only the FIRST 50 names
in ``registry.all_operators()`` enumeration order, so the rotation tuple
(`_R*_NEEDS_ROW_FIRST` in logdb_spark/registry.py) is the evidence
budget. Through r9 that tuple was hand-maintained from the verdict's
freshest-round table; this tool derives it mechanically from the
CORRECTNESS_r*.json files the driver leaves in the repo root:

  python -m tools.staleness            # prints the telemetry JSON
  python -m tools.staleness --tuple    # prints a ready-to-paste tuple

Output JSON (also written to STALENESS.json next to the reports):
  {
    "rounds_seen": [1, 2, ...],
    "freshest": {"op_name": {"round": N, "hash_match": true}, ...},
    "never_sampled": [...],
    "age_histogram": {"r1": 45, ...},
    "rotation": [...]    # full stale-first ordering, oldest evidence
  }

Rotation policy (matches the verdict prescription): order ops by
(freshest driver round ascending, name) with never-sampled ops FIRST
(they have no evidence at all), so the 50-row gate always consumes the
stalest surviving hashes. Ops whose latest row was NOT hash-green also
sort to the front of their round bucket — a red row is worse than an
old green one (none exist as of r9, but the tool must not assume that).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_reports(repo: Path = REPO) -> dict[int, dict]:
    reports: dict[int, dict] = {}
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if not m:
            continue
        with open(p) as f:
            reports[int(m.group(1))] = json.load(f)
    return reports


def _registry_names() -> list[str]:
    sys.path.insert(0, str(REPO))
    from logdb_spark import registry

    registry._load()
    # Registration (module build-phase) order, NOT enumeration order —
    # the rotation tuple is what DEFINES enumeration order, so deriving
    # it from enumeration order would be circular.
    return list(registry._REGISTRY)


def compute(repo: Path = REPO) -> dict:
    reports = _load_reports(repo)
    names = _registry_names()

    freshest: dict[str, dict] = {}
    for rnd in sorted(reports):
        for op, row in reports[rnd].items():
            if not isinstance(row, dict) or "rows_match" not in row:
                continue
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            )
            freshest[op] = {"round": rnd, "hash_green": green}

    never = [n for n in names if n not in freshest]
    hist: dict[str, int] = {}
    for n in names:
        key = f"r{freshest[n]['round']}" if n in freshest else "never"
        hist[key] = hist.get(key, 0) + 1

    def sort_key(n: str) -> tuple:
        if n not in freshest:
            return (0, 0, n)  # no evidence at all: front of the line
        row = freshest[n]
        if not row["hash_green"]:
            return (0, row["round"], n)  # stale red beats stale green
        return (1, row["round"], n)

    rotation = sorted(names, key=sort_key)
    return {
        "rounds_seen": sorted(reports),
        "freshest": {n: freshest[n] for n in names if n in freshest},
        "never_sampled": never,
        "age_histogram": dict(sorted(hist.items())),
        "rotation": rotation,
    }


def main(argv: list[str]) -> None:
    out = compute()
    (REPO / "STALENESS.json").write_text(json.dumps(out, indent=1) + "\n")
    if "--tuple" in argv:
        next_round = max(out["rounds_seen"]) + 1
        print(f"_R{next_round}_NEEDS_ROW_FIRST = (")
        for n in out["rotation"][:60]:
            age = out["freshest"].get(n)
            tag = f"r{age['round']}" if age else "never"
            print(f'    "{n}",  # {tag}')
        print(")")
    else:
        print(json.dumps({k: v for k, v in out.items() if k != "freshest"},
                         indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
