#!/usr/bin/env python3
"""Quality gate for the approximate operators: read target/recall_full.json
(written by graft.Bench / graft.Recall) and exit nonzero on any floor breach.

The artifact is self-gating — it carries its own "floors" map and the
"floor_failures" list computed in-engine (graft.RecallReport), so this script
only has to read and enforce; it also re-checks the numbers against the
embedded floors so a stale artifact with a hand-edited failures list can't
sneak past.

Usage: python3 scripts/check_recall.py [path/to/recall_full.json]
       (optionally run `sbt "runMain graft.Recall <sfDir>"` first — that main
        already exits nonzero on breach; this script is the driver-side /
        CI-side replica that works from the persisted artifact alone)
"""
import json
import sys
from pathlib import Path

# default resolves relative to the repo root (this script's parent dir),
# not the cwd — the gate must work when invoked from anywhere
path = Path(sys.argv[1]) if len(sys.argv) > 1 else (
    Path(__file__).resolve().parent.parent / "target/recall_full.json")
if not path.exists():
    print(f"FAIL: {path} missing — run graft.Bench or graft.Recall first")
    sys.exit(2)

art = json.loads(path.read_text())
floors = art.get("floors", {})
# a floors-less artifact (stale file from a pre-floors round, or a write
# that died mid-computation) must FAIL, not pass vacuously — the gate's
# whole point is that every metric is checked against an embedded floor
if not floors:
    print(f"FAIL: {path} carries no 'floors' map — stale or truncated artifact")
    sys.exit(1)
failures = list(art.get("floor_failures", []))

# independent re-check of the recorded numbers against the recorded floors
recalls = art.get("recall_at_10", {})
for name, floor in floors.items():
    if name in recalls and recalls[name] < floor:
        # dedup by metric name, not by formatted string: the artifact
        # formats numbers differently than this re-check would
        if not any(f.startswith(f"{name} ") for f in failures):
            failures.append(f"{name} recall {recalls[name]} < floor {floor}")
lsh = art.get("lsh_join_pair_recall")
if lsh is None:
    failures.append("lsh_join_pair_recall missing from artifact")
elif lsh < floors.get("lsh_join_pair_recall", 0.0):
    failures.append(f"lsh_join_pair_recall {lsh} < floor {floors['lsh_join_pair_recall']}")
hll = art.get("hll_max_rel_err")
if hll is None:
    failures.append("hll_max_rel_err missing from artifact")
elif hll > floors.get("hll_max_rel_err_max", 1.0):
    failures.append(f"hll_max_rel_err {hll} > ceil {floors['hll_max_rel_err_max']}")
# quantile sketch (round 14): absent only in pre-r14 artifacts — require
# it once the floors map carries the ceiling (self-describing artifact)
if "quantile_max_rel_err_max" in floors:
    qre = art.get("quantile_max_rel_err")
    if qre is None:
        failures.append("quantile_max_rel_err missing from artifact")
    elif qre > floors["quantile_max_rel_err_max"]:
        failures.append(
            f"quantile_max_rel_err {qre} > ceil {floors['quantile_max_rel_err_max']}")
if art.get("fastrp_matches_dense") is False:
    failures.append("fastrp_matches_dense is false")
if art.get("bpe_matches_sequential") is False:
    failures.append("bpe_matches_sequential is false")

for name, r in sorted(recalls.items()):
    mark = "ok  " if r >= floors.get(name, 0.0) else "FAIL"
    print(f"{mark} {name}: recall@10 {r} (floor {floors.get(name, '-')})")
lsh_ok = lsh is not None and lsh >= floors.get("lsh_join_pair_recall", 0.0)
hll_ok = hll is not None and hll <= floors.get("hll_max_rel_err_max", 1.0)
if "quantile_max_rel_err_max" in floors:
    qre = art.get("quantile_max_rel_err")
    q_ok = qre is not None and qre <= floors["quantile_max_rel_err_max"]
    print(f"{'ok  ' if q_ok else 'FAIL'} quantile_max_rel_err {qre}")
print(f"{'ok  ' if lsh_ok else 'FAIL'} lsh_join_pair_recall {lsh}")
print(f"{'ok  ' if hll_ok else 'FAIL'} hll_max_rel_err {hll}")

if failures:
    for f in dict.fromkeys(failures):
        print(f"FLOOR BREACH: {f}")
    sys.exit(1)
print("all quality floors hold")
