"""Join the two matched-RMSE trajectories into the north-star speedup table.

For each TF-reference evaluation point (wall_s, rmse), find the earliest
srm_tpu wall-clock whose RMSE is <= that level; the ratio is the measured
wall-clock speedup AT MATCHED PRESSURE RMSE (the BASELINE.md north star,
which asks for >= 20x).

Usage:
  python tools/rmse_report.py <srm_traj.json> <tf_traj.json>
"""

from __future__ import annotations

import json
import sys


def crossings(srm, tf):
    """For each TF eval point, the earliest srm point at or below its RMSE."""
    rows = []
    for pt in tf["trajectory"]:
        target = pt["rmse_psia"]
        hit = next((s for s in srm["trajectory"]
                    if s["rmse_psia"] <= target), None)
        rows.append({
            "rmse_level_psia": target,
            "tf_wall_s": pt["wall_s"], "tf_steps": pt["step"],
            "srm_wall_s": hit["wall_s"] if hit else None,
            "srm_steps": hit["steps"] if hit else None,
            "speedup": (round(pt["wall_s"] / hit["wall_s"], 1)
                        if hit and hit["wall_s"] > 0 else None),
        })
    return rows


def main(argv=None):
    argv = argv or sys.argv[1:]
    with open(argv[0]) as f:
        srm = json.load(f)
    with open(argv[1]) as f:
        tf = json.load(f)
    rows = crossings(srm, tf)
    tf_best = min(p["rmse_psia"] for p in tf["trajectory"])
    srm_best = min(p["rmse_psia"] for p in srm["trajectory"])
    out = {
        "predict_pi_rmse_psia": srm["rmse_predict_pi"],
        "tf_best_rmse_psia": tf_best,
        "srm_best_rmse_psia": srm_best,
        "matched_rmse_rows": rows,
        "speedups_at_tf_levels": [r["speedup"] for r in rows],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
