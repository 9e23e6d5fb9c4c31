"""LR schedule + optimizer: SGD with momentum, warmup, step decay.

The reference trained with SGD momentum 0.9 and step LR decay (SURVEY.md §2.1
"Train entry" [M]; Fast R-CNN §2.3 training detail). Warmup added — standard
for from-scratch detection training.
"""

from __future__ import annotations

import optax

from multipathnet_tpu.core.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig):
    decay = optax.piecewise_constant_schedule(
        cfg.lr,
        {int(s): cfg.lr_decay_factor for s in cfg.lr_decay_steps},
    )
    if cfg.warmup_steps <= 0:
        return decay
    warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def _trainable_mask(variables):
    """True only for the top-level "params" collection: auxiliary flax
    collections (batch_stats — BN running mean/var) must never be
    weight-decayed. Their gradients are already structurally zero (the
    train steps differentiate w.r.t. the params collection only), so this
    mask is what keeps add_decayed_weights from walking frozen BN stats."""
    import jax

    return {k: jax.tree.map(lambda _: k == "params", v)
            for k, v in variables.items()}


def make_optimizer(cfg: TrainConfig):
    lr = make_lr_schedule(cfg)
    chain = []
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.weight_decay,
                                               mask=_trainable_mask))
    chain.append(optax.sgd(lr, momentum=cfg.momentum))
    return optax.chain(*chain), lr
