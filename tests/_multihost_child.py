"""Child process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID and S2R_PLATFORM=cpu in the env; goes
through the real CLI bootstrap (config.apply_platform_override ->
distributed.maybe_initialize), the real loader (per-host strided batch
slices) and the real feed path (prefetch_to_device -> mesh.put_global),
then runs two jitted output-adapt train steps on the global mesh.
"""

import json
import os

from s2r_tpu.config import Config, apply_platform_override

apply_platform_override()  # forces cpu + initializes the process group

import jax  # noqa: E402

from s2r_tpu.core.mesh import make_mesh, replicate  # noqa: E402
from s2r_tpu.data.loader import make_data_loader  # noqa: E402
from s2r_tpu.parallel.feed import prefetch_to_device  # noqa: E402
from s2r_tpu.train.setup import build_method  # noqa: E402
from s2r_tpu.train.trainer import pick_num_devices  # noqa: E402


def main():
    # S2R_MH_DATAROOT switches the child to the on-disk gtav2cityscapes
    # fixture (created by the parent test) so the same 2-process run also
    # covers the native C++ backend's per-host input sharding.
    root = os.environ.get("S2R_MH_DATAROOT")
    if root:
        cfg = Config(dataset="gtav2cityscapes",
                     data_backend=os.environ.get("S2R_MH_BACKEND", "native"),
                     src_img_root=os.path.join(root, "src_img"),
                     src_label_root=os.path.join(root, "src_label"),
                     tgt_img_root=os.path.join(root, "tgt_img"),
                     val_img_root=os.path.join(root, "val_img"),
                     val_label_root=os.path.join(root, "val_label"),
                     test_img_root=os.path.join(root, "test_img"),
                     crop_size=32, base_size=32, batch_size=4, epochs=1,
                     precision="f32", workers=1)
    else:
        # S2R_MH_PADAUG exercises the batch-pad x multi-host x device-aug
        # interaction: staged u8 frames, the fused device warp over the
        # GLOBAL sharded batch, and a step padded to 8 (forced — 'auto'
        # only fires on TPU).
        padaug = bool(os.environ.get("S2R_MH_PADAUG"))
        cfg = Config(dataset="synthetic", crop_size=32, base_size=32,
                     batch_size=4, epochs=1, precision="f32", workers=1,
                     device_aug=padaug)
    padaug = bool(os.environ.get("S2R_MH_PADAUG"))
    if padaug:
        from s2r_tpu.train import setup as setup_mod
        setup_mod._step_pad_to = lambda cfg_, n: 8
    train, _val, _test, _nclass = make_data_loader(cfg)
    index_batches = train._index_batches()

    method = build_method(cfg, len(train), method="output_adapt")
    mesh = make_mesh(pick_num_devices(cfg.batch_size, None))
    state = replicate(method.init_state(jax.random.PRNGKey(0)), mesh)
    step = jax.jit(method.step_fn, donate_argnums=0)

    metrics = {}
    for i, batch in enumerate(prefetch_to_device(train, mesh)):
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if cfg.device_aug:
            from s2r_tpu.data import device_aug as DA
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            arrays = DA.augment_paired_batch(arrays, key, cfg.base_size,
                                             cfg.crop_size)
        state, metrics = step(state, arrays)
        if i == 1:
            break

    out = {
        "pid": jax.process_index(),
        "process_count": jax.process_count(),
        "ndev": len(jax.devices()),
        "index_batches": index_batches,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "step": int(state.step),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
