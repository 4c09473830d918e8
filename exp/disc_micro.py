"""Forward-only microbench: Pallas disc_conv1 vs XLA relayout+conv at the
step's real shape [8, 512, 19, 1024] bf16 (W-minor).  Timing: scan whose
carry is the INPUT, with a full-output-mean feedback term so every
iteration's conv depends on the last and cannot be DCE'd or hoisted."""
import time, jax, jax.numpy as jnp

def timed(name, fn, x, *rest, iters=50):
    def body(c, _):
        y = fn(c, *rest)
        return c + y.astype(jnp.float32).mean().astype(c.dtype), None
    g = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    jax.block_until_ready(g(x))  # compile+warm
    t0 = time.perf_counter(); jax.block_until_ready(g(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms", flush=True)

N,H,C,W,NDF = 8,512,19,1024,64
x = jax.random.normal(jax.random.PRNGKey(0),(N,H,C,W)).astype(jnp.bfloat16)
k = (jax.random.normal(jax.random.PRNGKey(1),(4,4,C,NDF))*0.05).astype(jnp.bfloat16)
b = jnp.zeros((NDF,), jnp.bfloat16)

from s2r_tpu.ops.pallas.disc_conv import disc_conv1
timed("pallas disc_conv1", lambda x: disc_conv1(x,k,b), x)

def xla_conv(x):
    xn = jnp.transpose(x,(0,1,3,2))
    y = jax.lax.conv_general_dilated(xn,k,(2,2),((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
    return y + b
timed("xla transpose+conv", xla_conv, x)
timed("baseline mean-only", lambda x: x[:, :256, :, :512, None] * 0 + 1, x)
