"""Optimisers, LR schedules and losses (optax).

Reference equivalent: utils/optim.py:8-50 — torch Adam/SGD with two param
groups (base params + feature extractor with ``lr_scale``) and timm
epoch-granular schedulers (step / multistep / cosine, with linear warmup).

Implementation notes:
- torch.optim.Adam semantics: L2 weight decay folded into the gradient
  *before* the Adam moments (not AdamW), eps added after the sqrt — mapped to
  ``optax.add_decayed_weights`` + ``optax.scale_by_adam``.
- the per-group ``lr_scale`` (timm schedulers multiply each group's lr by it)
  becomes an ``optax.masked`` gradient scale on the extractor subtree.
- schedules are epoch-granular like timm's defaults (t_in_epochs=True); the
  driver sets the current lr each epoch via ``inject_hyperparams``.
- masked cross-entropy for fixed-shape padded episodes.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None,
                  reduction: str = "mean") -> jnp.ndarray:
    """Masked CE over possibly-padded rows (reference: utils/optim.py:8-9).

    Padded-class logits arrive as NEG_INF from the heads; log_softmax handles
    them. Padded *rows* (mask == 0) contribute zero and are excluded from the
    mean's denominator.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is None:
        return nll.mean() if reduction == "mean" else nll.sum()
    m = mask.astype(jnp.float32)
    # select-then-sum, not multiply: a padded row whose logits degenerated
    # to +-inf upstream would turn 0 * inf into NaN (same hardening as the
    # masked-BN moments, masked_bn.py)
    total = jnp.where(m > 0, nll, 0.0).sum()
    if reduction == "sum":
        return total
    return total / jnp.maximum(m.sum(), 1.0)


def make_lr_schedule(args) -> Callable[[int], float]:
    """Epoch -> lr, matching timm's step/multistep/cosine with linear warmup
    (reference: utils/optim.py:34-43; timm create_scheduler semantics)."""
    base_lr = args.learning_rate
    warmup_t = getattr(args, "warmup_epochs", 0)
    warmup_lr = getattr(args, "warmup_lr", 1e-6)
    min_lr = getattr(args, "min_lr", 0.0)
    decay_epochs = getattr(args, "decay_epochs", 15)
    decay_rate = getattr(args, "decay_rate", 0.5)
    epochs = getattr(args, "epochs", 30)
    sched = getattr(args, "sched", "multistep")
    k_decay = getattr(args, "lr_k_decay", 1.0)
    # cooldown_epochs (timm create_scheduler) only extends the min-lr tail
    # PAST the single cosine cycle; the reference's training loop runs exactly
    # args.epochs epochs (single-step-learner.py:143), so within training it
    # is observable only through the t >= T branch below.

    if sched == "multistep":
        if decay_epochs >= epochs:
            milestones = [epochs + 1]
        else:
            milestones = list(range(decay_epochs, epochs, decay_epochs))
    else:
        milestones = []

    def schedule(epoch: int) -> float:
        if warmup_t and epoch < warmup_t:
            step = (base_lr - warmup_lr) / warmup_t
            return warmup_lr + epoch * step
        if sched == "multistep":
            k = sum(1 for m in milestones if epoch >= m)
            return base_lr * (decay_rate ** k)
        if sched == "step":
            return base_lr * (decay_rate ** (epoch // decay_epochs))
        if sched == "cosine":
            # timm CosineLRScheduler with warmup_prefix=True (reference
            # optim.py:40-43): t counts from the end of warmup, the cycle
            # length stays t_initial=epochs, k_decay bends the curve
            # (cos(pi * t^k / T^k), timm's k_decay), and epochs past the
            # single cycle (cycle_limit=1) — including any cooldown_epochs —
            # sit at min_lr.
            t = epoch - warmup_t
            T = max(epochs, 1)
            if t >= T:
                return min_lr
            return min_lr + 0.5 * (base_lr - min_lr) * (
                1 + math.cos(math.pi * (t ** k_decay) / (T ** k_decay)))
        raise ValueError(f"Unknown scheduler {sched}")

    return schedule


def _extractor_mask(params, flag: bool):
    """Pytree mask selecting the extractor subtree (or its complement)."""
    return {k: jax.tree_util.tree_map(lambda _: (k == "extractor") == flag, v)
            for k, v in params.items()}


def init_optimizer(params, args, extractor_lr_scale: float = 1.0,
                   optimizer_type: Optional[str] = None,
                   learning_rate: Optional[float] = None):
    """Build an optax transform mirroring the reference's two-group optimiser
    (reference: utils/optim.py:11-32). Returns (tx, opt_state); the current
    lr lives in ``opt_state.hyperparams['learning_rate']`` and is set per
    epoch by the driver."""
    optimizer_type = optimizer_type or args.optimizer
    lr0 = learning_rate if learning_rate is not None else args.learning_rate
    weight_decay = getattr(args, "weight_decay", 0.0)

    def make_tx(learning_rate):
        if optimizer_type == "adam":
            core = optax.scale_by_adam(
                b1=getattr(args, "betas", (0.9, 0.999))[0],
                b2=getattr(args, "betas", (0.9, 0.999))[1],
                eps=getattr(args, "epsilon", 1e-8),
            )
        elif optimizer_type == "sgd":
            momentum = getattr(args, "momentum", 0.0)
            core = optax.trace(decay=momentum) if momentum else optax.identity()
        else:
            raise ValueError(f"Unknown optimizer {optimizer_type}")
        steps = [optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                 core]
        if extractor_lr_scale != 1.0:
            steps.append(optax.masked(optax.scale(extractor_lr_scale),
                                      _extractor_mask(params, True)))
        steps.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*steps)

    tx = optax.inject_hyperparams(make_tx)(learning_rate=lr0)
    return tx, tx.init(params)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_curr_learning_rates(opt_state, extractor_lr_scale: float = 1.0):
    """(base lr, extractor lr) — reference: utils/optim.py:45-50."""
    lr = float(opt_state.hyperparams["learning_rate"])
    return lr, lr * extractor_lr_scale
