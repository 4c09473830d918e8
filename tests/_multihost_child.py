"""Child process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID and S2R_PLATFORM=cpu in the env; goes
through the real CLI bootstrap (config.apply_platform_override ->
distributed.maybe_initialize), the real loader (per-host strided batch
slices) and the real feed path (prefetch_to_device -> mesh.put_global),
then runs two jitted output-adapt train steps on the global mesh.
"""

import json

from s2r_tpu.config import Config, apply_platform_override

apply_platform_override()  # forces cpu + initializes the process group

import jax  # noqa: E402

from s2r_tpu.core.mesh import make_mesh, replicate  # noqa: E402
from s2r_tpu.data.loader import make_data_loader  # noqa: E402
from s2r_tpu.parallel.feed import prefetch_to_device  # noqa: E402
from s2r_tpu.train.setup import build_method  # noqa: E402
from s2r_tpu.train.trainer import pick_num_devices  # noqa: E402


def main():
    cfg = Config(dataset="synthetic", crop_size=32, base_size=32,
                 batch_size=4, epochs=1, precision="f32", workers=1)
    train, _val, _test, _nclass = make_data_loader(cfg)
    index_batches = train._index_batches()

    method = build_method(cfg, len(train), method="output_adapt")
    mesh = make_mesh(pick_num_devices(cfg.batch_size, None))
    state = replicate(method.init_state(jax.random.PRNGKey(0)), mesh)
    step = jax.jit(method.step_fn, donate_argnums=0)

    metrics = {}
    for i, batch in enumerate(prefetch_to_device(train, mesh)):
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
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
