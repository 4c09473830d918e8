"""Optimizers with exact torch update semantics, as pure pytree transforms.

The reference relies on torch.optim.SGD / Adam (train.py:63-82,
train_adapt.py:58-60).  Matching training dynamics requires torch's exact
update rules, which differ from optax defaults in where the learning rate and
weight decay enter:

torch SGD (momentum mu, weight_decay wd, nesterov):
    d    = grad + wd * p
    buf  = mu * buf + d              (buf starts as d on the first step —
                                      equivalent to a zero-initialized buffer)
    step = d + mu * buf   if nesterov else   buf
    p   <- p - lr * step

torch Adam (b1, b2, eps, wd):
    d  = grad + wd * p
    m  = b1 * m + (1-b1) * d ;  v = b2 * v + (1-b2) * d^2
    p <- p - lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)

In both, lr multiplies only the final step direction, so the reference's
1x/10x LR param groups (deeplab.py:42-72, lr_scheduler.py:63-70) are a
per-leaf multiplier applied at the very end — `apply_updates` takes an
optional `lr_mult` pytree.

The train.py method steps *multiple* optimizers over overlapping param sets
from one backward (train.py:200-204); these transforms keep independent state
per optimizer instance, so that composition is expressed directly in the
train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _tree_zeros(params):
    return jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)


@dataclasses.dataclass(frozen=True)
class SGD:
    momentum: float = 0.9
    weight_decay: float = 0.0
    nesterov: bool = False

    def init(self, params) -> Any:
        return {"momentum": _tree_zeros(params)}

    def direction(self, grads, state, params):
        """Returns (step direction to be scaled by lr, new state)."""
        wd, mu = self.weight_decay, self.momentum

        def leaf(g, buf, p):
            d = g.astype(jnp.float32)
            if wd:
                d = d + wd * p.astype(jnp.float32)
            new_buf = mu * buf + d
            step = d + mu * new_buf if self.nesterov else new_buf
            return step, new_buf

        flat = jax.tree.map(leaf, grads, state["momentum"], params)
        steps = jax.tree.map(lambda t: t[0], flat,
                             is_leaf=lambda t: isinstance(t, tuple))
        bufs = jax.tree.map(lambda t: t[1], flat,
                            is_leaf=lambda t: isinstance(t, tuple))
        return steps, {"momentum": bufs}


@dataclasses.dataclass(frozen=True)
class Adam:
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, params) -> Any:
        return {"m": _tree_zeros(params), "v": _tree_zeros(params),
                "count": jnp.zeros((), jnp.int32)}

    def direction(self, grads, state, params):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - self.b1 ** t
        bc2 = 1.0 - self.b2 ** t

        def leaf(g, m, v, p):
            d = g.astype(jnp.float32)
            if self.weight_decay:
                d = d + self.weight_decay * p.astype(jnp.float32)
            m_new = self.b1 * m + (1.0 - self.b1) * d
            v_new = self.b2 * v + (1.0 - self.b2) * jnp.square(d)
            step = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + self.eps)
            return step, m_new, v_new

        flat = jax.tree.map(leaf, grads, state["m"], state["v"], params)
        is_t = lambda t_: isinstance(t_, tuple)  # noqa: E731
        steps = jax.tree.map(lambda t_: t_[0], flat, is_leaf=is_t)
        ms = jax.tree.map(lambda t_: t_[1], flat, is_leaf=is_t)
        vs = jax.tree.map(lambda t_: t_[2], flat, is_leaf=is_t)
        return steps, {"m": ms, "v": vs, "count": count}


def make_optimizer(name: str, momentum: float, weight_decay: float,
                   nesterov: bool):
    """Mirror of the reference's --optimizer switch (train.py:63-82):
    torch.optim.Adam is constructed with lr only (no wd/momentum)."""
    if name == "SGD":
        return SGD(momentum=momentum, weight_decay=weight_decay,
                   nesterov=nesterov)
    if name == "Adam":
        return Adam()
    raise NotImplementedError(name)


def apply_updates(params, directions, lr, lr_mult: Optional[Any] = None):
    """p <- p - lr * mult * direction, preserving each param's dtype.

    `lr_mult` is a pytree of static per-leaf multipliers (or a prefix tree),
    implementing the 1x/10x group rule.
    """
    if lr_mult is None:
        return jax.tree.map(
            lambda p, d: (p.astype(jnp.float32) - lr * d).astype(p.dtype),
            params, directions)
    return jax.tree.map(
        lambda p, d, m: (p.astype(jnp.float32) - lr * m * d).astype(p.dtype),
        params, directions, lr_mult)


def lr_mult_tree(params, mult_by_top_key):
    """Build a per-leaf multiplier tree from top-level key -> multiplier.

    For DeepLab params this implements get_1x_lr_params/get_10x_lr_params
    (deeplab.py:42-72): {'backbone': 1.0, 'aspp': 10.0, 'decoder': 10.0}.
    """
    return {k: jax.tree.map(lambda _: float(mult_by_top_key[k]), sub)
            for k, sub in params.items()}


# ---------------------------------------------------------------------------
# Fused (flat-buffer) optimizer
# ---------------------------------------------------------------------------
#
# A DeepLab param tree has ~160 leaves; applying the update leaf-by-leaf
# costs XLA one fusion per leaf per op (~11 ms/step measured on v5e at
# batch 8 — pure scheduling overhead, not bandwidth).  The fused path
# concatenates all leaves into ONE f32 vector, runs the exact same torch
# update math as a handful of fused kernels, and splits back.  Numerics are
# identical (elementwise math, same order per element).

class _FlatSpec:
    """Static flattening metadata for a param tree."""

    def __init__(self, params):
        leaves, self.treedef = jax.tree.flatten(params)
        self.shapes = [l.shape for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        self.sizes = [int(np.prod(s)) if s else 1 for s in
                      [l.shape for l in leaves]]
        self.offsets = np.cumsum([0] + self.sizes)

    def flatten(self, tree) -> jnp.ndarray:
        leaves = jax.tree.leaves(tree)
        return jnp.concatenate(
            [l.reshape(-1).astype(jnp.float32) for l in leaves])

    def unflatten(self, flat: jnp.ndarray):
        leaves = [
            flat[self.offsets[i]:self.offsets[i + 1]]
            .reshape(self.shapes[i]).astype(self.dtypes[i])
            for i in range(len(self.sizes))
        ]
        return jax.tree.unflatten(self.treedef, leaves)

    def flat_consts(self, tree) -> np.ndarray:
        """Flatten a tree of static per-leaf scalars (e.g. lr multipliers)
        into a constant vector."""
        vals = jax.tree.leaves(tree)
        return np.concatenate([np.full(s, float(v), np.float32)
                               for s, v in zip(self.sizes, vals)])


class FusedOptimizer:
    """Flat-buffer wrapper around SGD/Adam with identical update math."""

    def __init__(self, opt, params, lr_mult=None):
        self.opt = opt
        self.spec = _FlatSpec(params)
        # Kept as numpy: this object may be constructed inside one jit trace
        # and reused by another, and a jnp constant born inside a trace is a
        # tracer that must not escape it.
        self.mult = (None if lr_mult is None
                     else self.spec.flat_consts(lr_mult))

    def init(self, params):
        flat = self.spec.flatten(params)
        if isinstance(self.opt, SGD):
            return {"momentum": jnp.zeros_like(flat)}
        return {"m": jnp.zeros_like(flat), "v": jnp.zeros_like(flat),
                "count": jnp.zeros((), jnp.int32)}

    def apply(self, grads, state, params, lr):
        """One fused update: returns (new_params_tree, new_state)."""
        g = self.spec.flatten(grads)
        p = self.spec.flatten(params)
        o = self.opt
        if isinstance(o, SGD):
            d = g + o.weight_decay * p if o.weight_decay else g
            buf = o.momentum * state["momentum"] + d
            step = d + o.momentum * buf if o.nesterov else buf
            new_state = {"momentum": buf}
        else:  # Adam
            count = state["count"] + 1
            t = count.astype(jnp.float32)
            d = g + o.weight_decay * p if o.weight_decay else g
            m = o.b1 * state["m"] + (1.0 - o.b1) * d
            v = o.b2 * state["v"] + (1.0 - o.b2) * jnp.square(d)
            step = (m / (1.0 - o.b1 ** t)) / (
                jnp.sqrt(v / (1.0 - o.b2 ** t)) + o.eps)
            new_state = {"m": m, "v": v, "count": count}
        if self.mult is not None:
            step = step * self.mult
        new_flat = p - lr * step
        return self.spec.unflatten(new_flat), new_state
