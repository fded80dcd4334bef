"""Gradient-based optimizers for inverse rendering.

Reference-parity module for Mitsuba's ``src/python/python/ad/optimizers.py``:
``Optimizer`` base (:18), ``SGD`` (:112, momentum form at :168-176) and
``Adam`` (:204, update rule :278-300 including the ``mask_updates`` variant
from "Masked updates" / sparse-Adam semantics).

Design differences (TPU-first):
- State is a pytree held by the optimizer object; every update is a pure
  jitted function of (params, grads, state) so a whole optimization step —
  render, loss, backward, update — compiles into ONE XLA program.
- Parameters are arbitrary pytrees (the reference restricts to Dr.Jit
  diff arrays keyed by traverse() strings; here any leaf works).
- The object also satisfies the tiny ``init/update`` protocol used by
  `tpusky.parallel.render.make_train_step`, so optimizers drop into the
  sharded training loop (gradients arrive psum-reduced).

Both optimizers support per-parameter learning rates via ``set_learning_rate``
(reference ``optimizers.py:71-86``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _tree_zeros_like(tree):
    return jax.tree.map(jnp.zeros_like, tree)


class Optimizer:
    """Base class: learning-rate bookkeeping shared by SGD/Adam.

    ``lr`` may be a float (applied to every leaf) or a pytree-prefix dict
    of per-parameter rates installed with :meth:`set_learning_rate`.
    """

    def __init__(self, lr: float):
        if lr < 0:
            raise ValueError("learning rate must be >= 0")
        self.lr = float(lr)
        self.lr_per_param: Dict[str, float] = {}

    def set_learning_rate(self, lr=None, **kwargs) -> None:
        """Set the default rate (float arg) and/or per-parameter rates by
        name (keyword args), mirroring ``optimizers.py:71-86``."""
        if lr is not None:
            self.lr = float(lr)
        for k, v in kwargs.items():
            self.lr_per_param[k] = float(v)

    def _leaf_lr(self, name: Optional[str]) -> float:
        if name is not None and name in self.lr_per_param:
            return self.lr_per_param[name]
        return self.lr

    def _named_leaves(self, tree):
        """(name, leaf) pairs; names come from NamedTuple fields or dict
        keys so per-param learning rates can address them."""
        if hasattr(tree, "_fields"):
            return list(zip(tree._fields, tree))
        if isinstance(tree, dict):
            # match jax.tree.flatten's sorted-key leaf order
            return sorted(tree.items())
        return [(None, leaf) for leaf in jax.tree.leaves(tree)]


class SGD(Optimizer):
    """Stochastic gradient descent with optional momentum.

    Update (reference ``optimizers.py:168-186``):
        v <- momentum * v + g
        p <- p - lr * v        (plain descent when momentum == 0)
    """

    def __init__(self, lr: float, momentum: float = 0.0):
        super().__init__(lr)
        if not (0.0 <= momentum < 1.0):
            raise ValueError("momentum must be in [0, 1)")
        self.momentum = float(momentum)

    # --- functional protocol -------------------------------------------
    def init(self, params) -> Any:
        return _tree_zeros_like(params)

    def update(self, grads, state, params=None):
        """Returns (updates, new_state); apply with p + u."""
        del params
        mom = self.momentum
        names = [n for n, _ in self._named_leaves(grads)]
        g_leaves, treedef = jax.tree.flatten(grads)
        s_leaves = treedef.flatten_up_to(state)
        lrs = [self._leaf_lr(names[i] if i < len(names) else None)
               for i in range(len(g_leaves))]
        if mom == 0.0:
            updates = treedef.unflatten(
                [-lr * jnp.asarray(g) for lr, g in zip(lrs, g_leaves)])
            return updates, state
        new_s = [mom * v + jnp.asarray(g) for v, g in zip(s_leaves, g_leaves)]
        updates = treedef.unflatten([-lr * v for lr, v in zip(lrs, new_s)])
        return updates, treedef.unflatten(new_s)

    # --- stateful convenience (the reference's dict-like usage) ---------
    def step(self, params, grads, state=None):
        state = self.init(params) if state is None else state
        updates, state = self.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state


class Adam(Optimizer):
    """Adam (Kingma & Ba 2015) with the reference's two extensions
    (``optimizers.py:204-300``):

    - ``mask_updates``: per-element sparse updates — moments and the
      bias-correction step count only advance where the gradient is
      nonzero (reference :234-238, following "masked" sparse-Adam).
    - ``uniform``: use the per-tensor max of the second moment instead of
      per-element (UniformAdam, Nicolet et al. 2021; reference :239-243)
      which keeps update directions parallel to the gradient — important
      for the LargeSteps mesh pipeline (`largesteps.py`).
    """

    def __init__(self, lr: float, beta_1: float = 0.9, beta_2: float = 0.999,
                 epsilon: float = 1e-8, mask_updates: bool = False,
                 uniform: bool = False):
        super().__init__(lr)
        if not (0 <= beta_1 < 1 and 0 <= beta_2 < 1):
            raise ValueError("betas must be in [0, 1)")
        self.beta_1, self.beta_2 = float(beta_1), float(beta_2)
        self.epsilon = float(epsilon)
        self.mask_updates = bool(mask_updates)
        self.uniform = bool(uniform)

    def init(self, params) -> Any:
        # per-leaf (m, v, t); t is per-element when mask_updates else scalar
        def leaf_state(p):
            p = jnp.asarray(p)
            t = jnp.zeros(p.shape if self.mask_updates else (),
                          dtype=jnp.float32)
            return (jnp.zeros_like(p), jnp.zeros_like(p), t)
        leaves, treedef = jax.tree.flatten(params)
        return treedef.unflatten([leaf_state(p) for p in leaves])

    def _leaf_update(self, g, st, lr):
        m, v, t = st
        b1, b2, eps = self.beta_1, self.beta_2, self.epsilon
        if self.mask_updates:
            nz = (g != 0)
            t = t + nz.astype(t.dtype)
            m_new = b1 * m + (1 - b1) * g
            v_new = b2 * v + (1 - b2) * g * g
            m = jnp.where(nz, m_new, m)
            v = jnp.where(nz, v_new, v)
            tc = jnp.maximum(t, 1.0)
        else:
            t = t + 1.0
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            tc = t
        m_hat = m / (1 - b1 ** tc)
        v_hat = v / (1 - b2 ** tc)
        if self.uniform:
            denom = jnp.sqrt(jnp.max(v_hat)) + eps
        else:
            denom = jnp.sqrt(v_hat) + eps
        u = -lr * m_hat / denom
        if self.mask_updates:
            u = jnp.where(g != 0, u, 0.0)
        return u, (m, v, t)

    def update(self, grads, state, params=None):
        del params
        names = [n for n, _ in self._named_leaves(grads)]
        g_leaves, treedef = jax.tree.flatten(grads)
        s_leaves = treedef.flatten_up_to(state)
        outs = []
        for i, (g, st) in enumerate(zip(g_leaves, s_leaves)):
            name = names[i] if i < len(names) else None
            lr = self._leaf_lr(name)
            g = jnp.asarray(g)
            outs.append(self._leaf_update(g, st, lr))
        updates = treedef.unflatten([u for u, _ in outs])
        new_state = treedef.unflatten([s for _, s in outs])
        return updates, new_state

    def step(self, params, grads, state=None):
        state = self.init(params) if state is None else state
        updates, state = self.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state
