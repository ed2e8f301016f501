#!/usr/bin/env python
"""A/B/C the safe-set pruning strategies on the SAME saturating fleet.

VERDICT r4 item 6: round 4 shipped diversity pruning exercised under real
growth, but fifo-vs-diversity-vs-quality was never compared and nothing
asserted that the round flown against a pruned set recovers. This driver
runs the fleet-LMPC campaign once per strategy with identical seeds
(PRNGKey(0) fleet dispersal, same seed trajectory, same small capacity so
saturation actually happens), collects the three artifacts, and emits one
comparison JSON with the per-strategy quality trajectories and the
post-prune recovery verdicts (now also gated inside run_fleet_lmpc_tpu).

    python scripts/run_prune_ab.py --cpu --batch 128 --rounds 7 \
        --capacity 32768 --out artifacts/campaign_prune_ab_cpu_128.json

Reference: /root/reference/src/terminal/memory_safe_set.py:218-248 (the
three strategy names; its "diversity" falls back to FIFO — ours is real).
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

STRATEGIES = ("fifo", "quality", "diversity")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--capacity", type=int, default=32768)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    here = Path(__file__).resolve().parent
    runs = {}
    for strat in STRATEGIES:
        out_file = Path(f"/tmp/prune_ab_{strat}.json")
        cmd = [
            sys.executable, str(here / "run_fleet_lmpc_tpu.py"),
            "--batch", str(args.batch), "--rounds", str(args.rounds),
            "--steps", str(args.steps), "--capacity", str(args.capacity),
            "--prune", strat, "--vertex-memory",
            "--out", str(out_file),
        ]
        if args.cpu:
            cmd.append("--cpu")
        print(f"=== strategy {strat}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd)
        res = json.loads(out_file.read_text())
        res["gate_pass"] = proc.returncode == 0
        runs[strat] = res

    def row(r):
        return {
            "final_success_rate": r["final_success_rate"],
            "probe_lane_costs": r["probe_lane_costs"],
            "probe_plan_values": r["probe_plan_values"],
            "touchdown_speed_by_round": r["touchdown_speed_by_round"],
            "prune_events": r["prune_events"],
            "post_prune_recovered": all(
                ev["recovered_within_5pct"] is not False
                for ev in r["prune_events"]),
            "n_prunes": len(r["prune_events"]),
            "gate_pass": r["gate_pass"],
            "final_probe_cost": r["probe_lane_costs"][-1],
        }

    table = {s: row(r) for s, r in runs.items()}
    # rank by final probe cost among strategies whose prunes recovered
    ranked = sorted(
        (s for s in STRATEGIES if table[s]["post_prune_recovered"]),
        key=lambda s: table[s]["final_probe_cost"],
    )
    result = {
        "campaign": "safe_set_prune_ab",
        "batch": args.batch,
        "rounds": args.rounds,
        "capacity": args.capacity,
        "shared_seeds": True,
        "strategies": table,
        "recovering_strategies_ranked_by_final_probe_cost": ranked,
        "recommended": ranked[0] if ranked else None,
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(result, indent=1))
    ok = bool(ranked)
    print("PRUNE A/B:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
