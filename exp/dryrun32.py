"""32-virtual-device multichip dryrun artifact (VERDICT r2 item 8).

Runs `__graft_entry__.dryrun_multichip(32)` — the FULL output-adapt train
step jitted over a 32-device 16x2 data x spatial mesh (self-provisioned
virtual CPU devices, same path the driver's multichip check uses) — and records the
result as MULTICHIP_32dev.json so the "dryrun validates to 32 devices"
claim has an in-tree artifact.

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python exp/dryrun32.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 32


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
        "note": "full output_adapt train step, 32-device 16x2 data x "
                "spatial mesh (batch N over 'data', image H over 'space' "
                "with GSPMD conv halo exchanges), one step on tiny shapes "
                "(virtual CPU devices)",
    }
    out = os.path.join(REPO, "MULTICHIP_32dev.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    if err:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
