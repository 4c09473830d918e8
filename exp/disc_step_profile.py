"""Trace the pallas_d1 output-adapt step and print the category table."""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from s2r_tpu.config import Config
from s2r_tpu.train.setup import build_method
from s2r_tpu.models import FCDiscriminator
from s2r_tpu.train.lr_schedule import make_lr_schedule
from s2r_tpu.train.losses import build_seg_loss
from s2r_tpu.train.optim import SGD, Adam
from s2r_tpu.train.steps import make_output_adapt_step
import exp.profile_step as P

H, W = 512, 1024
cfg = Config(crop_size=H, base_size=H, batch_size=8, epochs=200, precision="bf16")
m = build_method(cfg, 1000, method="output_adapt")
state = m.init_state(jax.random.PRNGKey(0))
discr = FCDiscriminator(num_classes=19, dtype=jnp.bfloat16, pallas_wminor_conv1=True)
step = jax.jit(make_output_adapt_step(
    m.deeplab, discr,
    SGD(momentum=cfg.momentum, weight_decay=cfg.weight_decay, nesterov=cfg.nesterov),
    Adam(b1=0.9, b2=0.99),
    make_lr_schedule(cfg.lr_scheduler, cfg.lr, cfg.epochs, 1000),
    build_seg_loss(cfg.loss_type, None), cfg.adv_softmax_axis), donate_argnums=0)
batch = P.make_batch(8)
state, _ = step(state, batch)
for _ in range(2):
    state, _ = step(state, batch)
jax.block_until_ready(state.params)
logdir = "/tmp/prof_pallas_d1"
jax.profiler.start_trace(logdir)
for _ in range(P.TRACE_STEPS):
    state, _ = step(state, batch)
jax.block_until_ready(state.params)
jax.profiler.stop_trace()
P.report("pallas_d1_b8", float("nan"), logdir)
