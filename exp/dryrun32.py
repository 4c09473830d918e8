"""N-virtual-device multichip dryrun artifact (VERDICT r2 item 8).

Runs `__graft_entry__.dryrun_multichip(N)` — BOTH full train steps
(output-adapt, then the 3-optimizer feature-adapt) jitted over an N-device
(N/2)x2 data x spatial mesh (self-provisioned virtual CPU devices, same
path the driver's multichip check uses) — and records the result as
MULTICHIP_{N}dev.json so the "dryrun validates to N devices" claim has an
in-tree artifact.  N defaults to 32; override with DRYRUN_N
(MULTICHIP_64dev.json was produced with DRYRUN_N=64, a 32x2 mesh).

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH [DRYRUN_N=64] python exp/dryrun32.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("DRYRUN_N", "32"))


def main() -> None:
    from __graft_entry__ import dryrun_multichip

    t0 = time.time()
    err = None
    try:
        dryrun_multichip(N)
    except Exception as e:  # record the failure rather than half-writing
        err = f"{type(e).__name__}: {e}"
    rec = {
        "n_devices": N,
        "ok": err is None,
        "seconds": round(time.time() - t0, 1),
        "error": err,
        "note": f"full output_adapt + feature_adapt train steps, {N}-device "
                f"{N // 2}x2 data x spatial mesh (batch N over 'data', "
                f"image H over 'space' with GSPMD conv halo exchanges; "
                f"feature_adapt shards the 4-way overlapping optimizer "
                f"partition too), one step each on tiny shapes (virtual "
                f"CPU devices)",
    }
    out = os.path.join(REPO, f"MULTICHIP_{N}dev.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    if err:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
