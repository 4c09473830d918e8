"""Channel argmax as two simple reduces (first-index tie semantics).

The reference argmaxes logits on the host with numpy (`utils/metrics.py`
`np.argmax`, `val_adapt.py:198` `output.data.cpu().numpy().argmax(1)`); we
argmax on device inside the jitted eval/serving programs.  XLA lowers
``jnp.argmax`` to a variadic (value, index) reduce — ``iota_reduce_fusion``
in profiles — which on TPU runs far off the HBM roofline for the
segmentation shape (C=19 in the minor/lane dim): measured 5.23 ms at
[8,256,512,19] bf16 and a multiple of that at full res, vs ~0.15 ms of
logical traffic.

``argmax_first`` reformulates it as two *simple* reduces that Mosaic
handles well and XLA can fuse with neighbours::

    amax = max(x, axis)                  # plain max-reduce
    idx  = min(where(x == amax, iota, n))  # plain min-reduce

This is exact, including ties: ``where`` keeps every position attaining
the max and the min-reduce picks the FIRST index — the same tie rule as
``np.argmax`` / ``jnp.argmax`` / ``torch.argmax`` (pinned against
jnp.argmax with forced exact ties in tests/test_ops.py).  Inputs must be
NaN-free (segmentation logits are; a NaN column would return ``n``
where numpy returns the NaN's index).

Measured (v5e, scan-of-iters + readback methodology): 2.51 vs 5.23 ms at
[8,256,512,19] bf16 — 2.1x; serving integration numbers in PARITY.md
§Performance.

COMPILE-TIME CAVEAT: at full resolution ([8,1024,2048,19]) XLA compiles
this pattern pathologically slowly on the axon backend (the round-4
rehearsal's servable export went 73 s -> 2187 s; a standalone full-res
jit didn't finish compiling in 10 min) while the runtime win there is
neutral-to-2% anyway (the full-res argmax already fuses into the upsample
consumers).  So this op is wired ONLY where the argmax runs at decoder
resolution (serving ``argmax_res='decoder'``); full-res eval/serving
paths keep ``jnp.argmax``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_first(x: jax.Array, axis: int = -1) -> jax.Array:
    """Exact ``jnp.argmax(x, axis)`` (int32, first-max-wins ties) as two
    simple reduces — much faster than XLA's variadic-reduce lowering for
    small minor-dim channel counts on TPU."""
    axis = axis % x.ndim
    n = x.shape[axis]
    amax = jnp.max(x, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.min(jnp.where(x == amax, iota, n), axis=axis)
