"""Optimizers and LR schedules, optax-native.

Ports the reference's schedule semantics (enhancing/utils/scheduler.py:13-89 —
multiplicative LambdaLR factors applied per *step*) as pure step->multiplier
functions, and the two optimizer recipes:

- stage-1 AE + discriminator: AdamW(betas=(0.9, 0.99), wd=1e-4)
  (reference vitvqgan.py:160-164)
- stage-2 prior: Adam(betas=(0.9, 0.96)) with the minGPT decay/no-decay param
  split — biases, LayerNorm/Embedding weights, time_* (RWKV) and pos_emb*
  params get no weight decay (reference transformer.py:132-194).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


class BaseScheduler:
    """step -> multiplier (relative to the base LR)."""

    start: float

    def schedule(self, n):
        raise NotImplementedError

    def __call__(self, n):
        return self.schedule(n) * self.start


class ExponentialDecayScheduler(BaseScheduler):
    """exp(-scale*n) decayed every ``decay_every_step`` steps, floored at
    ``end`` (reference scheduler.py:27-42)."""

    def __init__(self, start: float, end: float, decay_every_step: int,
                 scale_factor: float) -> None:
        self.start, self.end = start, end
        self.decay_every_step = decay_every_step
        self.scale_factor = scale_factor

    def schedule(self, n):
        n = jnp.asarray(n, jnp.float32)
        # piecewise-constant between decay points (functional version of the
        # reference's stateful "only update when n % decay == 0")
        n_eff = jnp.floor(n / self.decay_every_step) * self.decay_every_step
        res = jnp.exp(-self.scale_factor * n_eff) * self.start
        return jnp.maximum(self.end, res) / self.start


class LambdaWarmUpCosineScheduler(BaseScheduler):
    """Linear warmup to max_, cosine decay to min_ (reference scheduler.py:45-66)."""

    def __init__(self, warm_up_steps: int, max_decay_steps: int, min_: float,
                 max_: float, start: float = 1.0) -> None:
        assert max_decay_steps >= warm_up_steps
        self.warm_up_steps = warm_up_steps
        self.max_decay_steps = max_decay_steps
        self.min_, self.max_, self.start = min_, max_, start

    def schedule(self, n):
        n = jnp.asarray(n, jnp.float32)
        warm = ((self.max_ - self.start) / max(self.warm_up_steps, 1) * n
                + self.start)
        t = jnp.clip((n - self.warm_up_steps)
                     / max(self.max_decay_steps - self.warm_up_steps, 1),
                     0.0, 1.0)
        decay = self.min_ + 0.5 * (self.max_ - self.min_) * (
            1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < self.warm_up_steps, warm, decay) / self.start


class LambdaWarmUpLinearScheduler(BaseScheduler):
    """Linear warmup then linear decay (reference scheduler.py:69-89 — the
    reference body has an undefined-variable bug; this implements its evident
    intent)."""

    def __init__(self, warm_up_steps: int, max_decay_steps: int, min_: float,
                 max_: float, start: float = 1.0) -> None:
        assert max_decay_steps >= warm_up_steps
        self.warm_up_steps = warm_up_steps
        self.max_decay_steps = max_decay_steps
        self.min_, self.max_, self.start = min_, max_, start

    def schedule(self, n):
        n = jnp.asarray(n, jnp.float32)
        warm = ((self.max_ - self.start) / max(self.warm_up_steps, 1) * n
                + self.start)
        decay = self.min_ + (self.max_ - self.min_) * jnp.clip(
            (self.max_decay_steps - n) / max(self.max_decay_steps, 1), 0., 1.)
        return jnp.where(n < self.warm_up_steps, warm, decay) / self.start


def make_lr_schedule(base_lr: float,
                     scheduler: Optional[BaseScheduler]) -> Schedule:
    if scheduler is None:
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    return lambda step: base_lr * scheduler.schedule(step)


def make_ae_optimizer(base_lr: float, scheduler=None,
                      accumulate: int = 1) -> optax.GradientTransformation:
    """AdamW for the stage-1 autoencoder / discriminator
    (reference vitvqgan.py:160-164)."""
    tx = optax.adamw(make_lr_schedule(base_lr, scheduler), b1=0.9, b2=0.99,
                     weight_decay=1e-4)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


_NO_DECAY_PAT = re.compile(
    r"(bias$)|(^|/)(pos_emb_cond|pos_emb_code|pos_emb_depth|time_mix)"
    r"|(embedding$)|(scale$)|(layer_norm|ln1|ln2|ln_spatial|ln_depth|norm)"
)


def gpt_decay_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where weight decay applies (minGPT split, transformer.py:140-179)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path) -> bool:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return _NO_DECAY_PAT.search(name) is None

    paths = [p for p, _ in flat]
    leaves = [decide(p) for p in paths]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_gpt_optimizer(base_lr: float, scheduler=None, weight_decay: float = 0.01,
                       accumulate: int = 1) -> optax.GradientTransformation:
    """Adam(0.9, 0.96) with selective weight decay
    (reference transformer.py:177-181)."""
    lr = make_lr_schedule(base_lr, scheduler)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.96),
        optax.add_decayed_weights(weight_decay, mask=gpt_decay_mask),
        optax.scale_by_learning_rate(lr),
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx
