"""Optimiser / schedule / loss unit tests
(reference: utils/optim.py:8-50 + timm scheduler semantics)."""
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orbit_tpu.utils.optim import (cross_entropy, get_curr_learning_rates,
                                   init_optimizer, make_lr_schedule,
                                   set_learning_rate)


def sched_args(**over):
    base = dict(learning_rate=1e-2, warmup_epochs=0, warmup_lr=1e-6,
                min_lr=0.0, decay_epochs=2, decay_rate=0.5, epochs=8,
                sched="multistep")
    base.update(over)
    return SimpleNamespace(**base)


def test_multistep_schedule():
    s = make_lr_schedule(sched_args())
    # milestones at 2, 4, 6
    assert s(0) == 1e-2 and s(1) == 1e-2
    assert s(2) == pytest.approx(5e-3)
    assert s(4) == pytest.approx(2.5e-3)
    assert s(6) == pytest.approx(1.25e-3)


def test_warmup_then_cosine():
    """timm CosineLRScheduler, warmup_prefix=True: the cycle length stays
    t_initial=epochs and t counts from the end of warmup (reference
    optim.py:40-43), so the curve has NOT completed at epoch==epochs."""
    s = make_lr_schedule(sched_args(sched="cosine", warmup_epochs=2,
                                    warmup_lr=1e-6, epochs=6, min_lr=0.0))
    assert s(0) == pytest.approx(1e-6)
    assert s(1) == pytest.approx(1e-6 + (1e-2 - 1e-6) / 2)
    assert s(2) == pytest.approx(1e-2)                    # cosine start (t=0)
    # t=4 of a 6-epoch cycle: 0.5*base*(1+cos(2pi/3))
    assert s(6) == pytest.approx(0.5e-2 * (1 + np.cos(2 * np.pi / 3)))
    assert s(8) == pytest.approx(0.0, abs=1e-12)          # cycle done -> min_lr
    assert s(11) == pytest.approx(0.0, abs=1e-12)         # cooldown region


def test_cosine_k_decay_and_cooldown():
    """lr_k_decay bends the cosine (timm k_decay: cos(pi*t^k/T^k)); the
    reference defaults it to 0.1 (reference args.py:154-155). Epochs past the
    cycle (cooldown_epochs) sit at min_lr."""
    base = sched_args(sched="cosine", epochs=8, min_lr=1e-6)
    s1 = make_lr_schedule(base)
    sk = make_lr_schedule(sched_args(sched="cosine", epochs=8, min_lr=1e-6,
                                     lr_k_decay=0.1, cooldown_epochs=3))
    t, T, k = 2, 8, 0.1
    expect = 1e-6 + 0.5 * (1e-2 - 1e-6) * (1 + np.cos(np.pi * t**k / T**k))
    assert sk(2) == pytest.approx(expect)
    # k<1 front-loads the decay
    assert sk(2) < s1(2)
    # monotone non-increasing over the cycle
    vals = [sk(e) for e in range(0, 9)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert sk(8) == pytest.approx(1e-6) and sk(10) == pytest.approx(1e-6)


def test_step_schedule():
    s = make_lr_schedule(sched_args(sched="step", decay_epochs=3))
    assert s(2) == 1e-2 and s(3) == pytest.approx(5e-3) and s(6) == pytest.approx(2.5e-3)


def test_masked_cross_entropy():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    labels = jnp.asarray([0, 1, 0])
    mask = jnp.asarray([1.0, 1.0, 0.0])
    # masked rows excluded from the mean
    full = cross_entropy(logits[:2], labels[:2])
    masked = cross_entropy(logits, labels, mask)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)
    # sum reduction
    s = cross_entropy(logits, labels, mask, reduction="sum")
    np.testing.assert_allclose(float(s), 2 * float(full), rtol=1e-6)


def test_optimizer_updates_and_lr_injection():
    params = {"extractor": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    args = SimpleNamespace(optimizer="adam", learning_rate=1e-2,
                           weight_decay=0.0, betas=(0.9, 0.999), epsilon=1e-8)
    tx, state = init_optimizer(params, args, extractor_lr_scale=0.1)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    # extractor update scaled by 0.1 relative to head
    ratio = float(updates["extractor"]["w"][0] / updates["head"]["w"][0])
    assert ratio == pytest.approx(0.1, rel=1e-3)

    state = set_learning_rate(state, 5e-3)
    lr, fe_lr = get_curr_learning_rates(state, extractor_lr_scale=0.1)
    assert lr == pytest.approx(5e-3) and fe_lr == pytest.approx(5e-4)


def test_sgd_momentum():
    params = {"extractor": {"w": jnp.zeros((2,))}, "head": {"w": jnp.zeros((2,))}}
    args = SimpleNamespace(optimizer="sgd", learning_rate=1.0,
                           weight_decay=0.0, momentum=0.9)
    tx, state = init_optimizer(params, args)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    # torch SGD momentum: buf = g + m*buf -> second step 1.9x first
    assert float(u2["head"]["w"][0] / u1["head"]["w"][0]) == pytest.approx(1.9)
