"""Self-contained optimizers: Adam, SGD(+momentum), global-norm clipping.

Covers the reference's optimizer surface (train.py:72-80,:124-132 — SGD
with momentum / Adam, both with L2 weight decay) and the grad clip at
solver.py:184-185 (torch clip_grad_norm_ semantics: scale by
max_norm / (||g||_2 + 1e-6) only when the global norm exceeds max_norm).

Everything operates on pytrees and runs inside jit; the learning rate is a
traced scalar carried in the optimizer state so LR-halving (solver.py:
105-123) requires no recompilation.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = Any
Grads = Any


class OptState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    lr: jnp.ndarray  # f32 scalar (mutable across halving)
    mu: Any  # first moment (adam) or momentum buffer (sgd); empty pytree if unused
    nu: Any  # second moment (adam); empty pytree if unused


def global_norm(tree: Grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def clip_by_global_norm(grads: Grads, max_norm: float) -> Tuple[Grads, jnp.ndarray]:
    """torch.nn.utils.clip_grad_norm_ semantics (scale = max_norm/(norm+1e-6))."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


class Optimizer:
    """Functional optimizer: opt.init(params) -> state; opt.update(...)."""

    def __init__(self, kind: str = "adam", lr: float = 1e-3, momentum: float = 0.0,
                 weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8):
        if kind not in ("adam", "sgd"):
            raise ValueError(f"unsupported optimizer: {kind}")
        self.kind = kind
        self.lr = lr
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, params: Params) -> OptState:
        # Jitted: one program instead of one eager zeros op per leaf (a
        # per-op network round trip on remote backends).
        return jax.jit(self._init_impl)(params)

    def _init_impl(self, params: Params) -> OptState:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        if self.kind == "adam":
            mu, nu = zeros, jax.tree_util.tree_map(jnp.zeros_like, params)
        else:
            mu = zeros if self.momentum != 0.0 else jax.tree_util.tree_map(
                lambda p: jnp.zeros((), p.dtype), params
            )
            nu = jax.tree_util.tree_map(lambda p: jnp.zeros((), p.dtype), params)
        return OptState(
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.lr, jnp.float32),
            mu=mu,
            nu=nu,
        )

    def update(self, grads: Grads, state: OptState, params: Params
               ) -> Tuple[Params, OptState]:
        step = state.step + 1
        lr = state.lr
        wd = self.weight_decay
        if wd:
            # torch couples L2 into the gradient (not decoupled AdamW).
            grads = jax.tree_util.tree_map(lambda g, p: g + wd * p, grads, params)

        if self.kind == "adam":
            b1, b2, eps = self.b1, self.b2, self.eps
            mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
            nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
            t = step.astype(jnp.float32)
            bc1 = 1 - b1**t
            bc2 = 1 - b2**t
            new_params = jax.tree_util.tree_map(
                lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
                params, mu, nu,
            )
            return new_params, OptState(step, lr, mu, nu)

        # SGD (+momentum), torch semantics: buf = mom*buf + g; p -= lr*buf.
        if self.momentum != 0.0:
            mu = jax.tree_util.tree_map(
                lambda b, g: self.momentum * b + g, state.mu, grads
            )
            new_params = jax.tree_util.tree_map(lambda p, b: p - lr * b, params, mu)
            return new_params, OptState(step, lr, mu, state.nu)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, OptState(step, lr, state.mu, state.nu)


def set_lr(state: OptState, lr) -> OptState:
    return state._replace(lr=jnp.asarray(lr, jnp.float32))
