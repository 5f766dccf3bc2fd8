"""Jitted per-task step functions for meta-training and evaluation.

This is where the reference's Python training loops become compiled XLA
programs. One program is compiled per episode *bucket* shape (the data layer
pads episodes to a small set of shapes — orbit_tpu.data.episodes), after
which every task of that shape reuses the cached executable.

Reference equivalents:
- ``build_train_task``       <- single-step-learner.py:196-210 (train_task)
- ``build_train_task_lite``  <- single-step-learner.py:212-243
  (train_task_with_lite) + few_shot_recognisers.py:328-437 (LITE caching)
- ``build_eval_fns``         <- the personalise/predict calls in
  validate/test (single-step-learner.py:245-375)

Gradient-accumulation contract: each train step returns
``(grads, loss, target_logits, new_bn_stats_or_None)`` — the gradient is the
task's contribution already scaled by ``1/tasks_per_batch`` like the
reference's scaled ``loss.backward()``; the driver accumulates with
``accumulate_grads`` and applies one optimiser update every
``tasks_per_batch`` tasks, threading the updated BatchNorm running stats
back into the variables when meta-training the extractor.

LITE gradient structure (exact reference parity, SURVEY.md §7 hard part 4):
per target batch, loss = ``len(context)/(num_lite_samples*tasks_per_batch) *
CE(batch)`` + ``0.001*film_l2``; a fresh random subset of ``num_lite_samples``
context clips is re-embedded *with* gradients each batch while the remaining
clips come from a no-grad cache computed once per task
(few_shot_recognisers.py:388-437: ``reps_cache``/``features_cache``; note the
feature cache is built with the first batch's FiLM values and reused — the
FiLM *values* are numerically identical across batches because the grad-subset
recompute reproduces the cached activations, so this is consistent, and we
reproduce it by building the cache from the fully-cached task embedding).
"""
from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from orbit_tpu.ops.tiny_attention import default_impl
from orbit_tpu.utils.optim import cross_entropy

FILM_REG_WEIGHT = 0.001  # reference: single-step-learner.py:204,233

# Measured crossover for the fused Pallas forward+backward kernels on the
# differentiated train path (ViT-B/32 @224 bf16, real v5e — PERF.md "ViT
# train path"): at the protocol-scale dispatch batch of 256 the fused
# fwd+bwd step wins (125.5 vs 131.7 ms/task-step); at batch 32 the kernel
# grids are too short to amortise and XLA wins (40.9 vs 48.6 ms). The
# boundary sits between those measurements; 64 is the smallest batch at
# which the kernels were observed at parity-or-better.
PALLAS_BWD_MIN_BATCH = 64


def train_impl_scope(batch_size: int):
    """Trace-time implementation scope for *differentiated* step bodies.

    At or above :data:`PALLAS_BWD_MIN_BATCH` dispatch rows the body keeps
    the module defaults — on TPU that is the fused Pallas forward AND
    backward kernels (ops/tiny_attention.py, ops/mlp_block.py), the
    measured-fastest train path at protocol scale. Below the crossover the
    body is traced with the XLA reference ops instead. Either way an
    explicit ``force_impl()`` override already in effect still wins
    (``default_impl`` yields to it), so benchmarks and parity tests can
    pin any implementation around a whole step.
    """
    if batch_size >= PALLAS_BWD_MIN_BATCH:
        return contextlib.nullcontext()
    return default_impl("xla")


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


# the running accumulator (arg 0) is dead after each call — donating it
# lets XLA update the ~88M-param grad tree in place instead of allocating
# a fresh copy every task (VERDICT r4 #6; no-op on backends without
# donation support, e.g. the CPU test mesh)
accumulate_grads = jax.jit(tree_add, donate_argnums=(0,))


def _split_variables(variables):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return params, rest


def _freeze_extractor(params, learn_extractor: bool):
    """Zero gradient flow into the extractor when it is frozen
    (reference: freeze_extractor, model/feature_extractors.py:81-87). FiLM
    overrides replace leaves wholesale, so generator gradients still flow."""
    if learn_extractor:
        return params
    return {**params, "extractor": jax.lax.stop_gradient(params["extractor"])}


def build_train_task(recogniser: SingleStepFewShotRecogniser, args,
                     jit: bool = True) -> Callable:
    """Jitted non-LITE meta-training step: personalise on context, predict
    target, CE/tasks_per_batch + film L2 (single-step-learner.py:196-210).

    Returns fn(variables, episode, rng) ->
    (grads, loss, target_logits, new_bn_stats_or_None).
    """
    tasks_per_batch = args.tasks_per_batch
    train_bn = args.learn_extractor  # _set_batch_norm_state semantics

    def loss_fn(params, rest, episode):
        variables = {"params": _freeze_extractor(params, args.learn_extractor), **rest}
        # when meta-training the extractor, BN running stats update through
        # the context then target passes, mirroring the reference's
        # extractor.train() forwards (few_shot_recognisers.py:176-183);
        # padded rows are excluded from BN batch statistics via the clip
        # masks (models/backbones/masked_bn.py)
        task_state = recogniser.personalise(
            variables, episode["context_clips"], episode["context_labels"],
            episode["context_mask"], episode["class_mask"].shape[0],
            train=train_bn, with_grad=True, collect_stats=train_bn)
        new_stats = task_state["batch_stats"]
        if new_stats is not None:
            variables = {**variables,
                         "batch_stats": {**variables["batch_stats"], "extractor": new_stats}}
        pred = recogniser.predict(
            variables, task_state, episode["target_clips"],
            class_mask=episode["class_mask"], train=train_bn, with_grad=True,
            collect_stats=train_bn, clip_mask=episode["target_mask"])
        logits, new_stats = pred if train_bn else (pred, None)
        ce = cross_entropy(logits, episode["target_labels"], episode["target_mask"])
        # an all-padding episode (target_mask all zero — used by episode-DP to
        # fill the last device group) must contribute EXACTLY zero loss and
        # gradient, including the film regulariser
        is_real = (episode["target_mask"].sum() > 0).astype(jnp.float32)
        loss = is_real * (ce / tasks_per_batch
                          + FILM_REG_WEIGHT * task_state["film_l2"])
        return loss, (logits, new_stats)

    def train_task(variables, episode, rng):
        del rng  # non-LITE uses no per-task randomness on device
        params, rest = _split_variables(variables)
        # differentiated path: fused Pallas fwd+bwd kernels at protocol-
        # scale dispatch batches, XLA below the measured crossover
        # (train_impl_scope; PERF.md "ViT train path")
        with train_impl_scope(args.batch_size):
            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, rest, episode)
        return grads, loss, logits, new_stats

    return jax.jit(train_task) if jit else train_task


def build_train_task_lite(recogniser: SingleStepFewShotRecogniser, args,
                          jit: bool = True) -> Callable:
    """Jitted LITE meta-training step (single-step-learner.py:212-243).

    The reference's Python loop over target batches becomes a ``lax.scan``
    that carries the accumulated gradient pytree; each iteration draws a
    fresh LITE subset, rebuilds the personalised state from the no-grad
    caches + grad subset, predicts one target batch and adds that batch's
    gradient to the carry — the same memory profile as per-batch
    ``loss.backward()``.
    """
    tasks_per_batch = args.tasks_per_batch
    num_lite = args.num_lite_samples
    batch_size = args.batch_size
    train_bn = args.learn_extractor

    def lite_grad_subset(rng, mask, n):
        """Random ``num_lite`` indices, preferring valid rows (the reference
        permutes real rows only, few_shot_recognisers.py:335-336)."""
        noise = jax.random.uniform(rng, (n,))
        order = jnp.argsort(noise - mask.astype(jnp.float32) * 10.0)
        return order[: min(num_lite, n)]

    def batch_loss_fn(params, rest, stats, caches, episode, grad_idxs,
                      tgt_clips, tgt_labels, tgt_mask):
        """One LITE target batch. ``stats`` (learn_extractor only) is the BN
        running-stat tree threaded through the scan: like the reference's
        train()-mode forwards, BOTH the per-batch grad-subset recompute and
        the target-batch predict update the running stats
        (few_shot_recognisers.py:176-183,415-437); measured drift of the
        old once-per-task schedule was 0.23 running-std after 30 tasks
        (tests/test_lite_bn_drift.py), so the schedule is reproduced
        exactly rather than approximated."""
        if stats is not None:
            rest = {**rest, "batch_stats": {**rest["batch_stats"],
                                            "extractor": stats}}
        variables = {"params": _freeze_extractor(params, args.learn_extractor), **rest}
        ctx = episode["context_clips"]
        ctx_mask = episode["context_mask"]
        num_classes = episode["class_mask"].shape[0]
        t = ctx.shape[1]

        film_values, film_l2 = None, jnp.float32(0.0)
        if recogniser.adapt_features:
            # task embedding: cached reps + grad-subset recompute
            grad_frames = ctx[grad_idxs].reshape(-1, *ctx.shape[2:])
            grad_reps = recogniser.set_encoder.apply(
                {"params": variables["params"]["set_encoder"]},
                recogniser._maybe_normalize(grad_frames)
            ).reshape(grad_idxs.shape[0], t, -1)
            reps = caches["reps"].at[grad_idxs].set(grad_reps)
            fm = jnp.repeat(ctx_mask.astype(jnp.float32)[:, None], t, axis=1)
            emb = (reps * fm[..., None]).sum(axis=(0, 1)) / jnp.maximum(fm.sum(), 1.0)
            film_values, film_l2 = recogniser.generate_film(variables, emb)

        # context features: no-grad cache + grad-subset recompute
        if stats is not None:
            grad_feats, stats = recogniser.embed_clips(
                variables, ctx[grad_idxs], film_values, train=True,
                with_grad=True, collect_stats=True,
                clip_mask=ctx_mask[grad_idxs])
            variables = {**variables,
                         "batch_stats": {**variables["batch_stats"],
                                         "extractor": stats}}
        else:
            grad_feats = recogniser.embed_clips(
                variables, ctx[grad_idxs], film_values, train=train_bn,
                with_grad=True, clip_mask=ctx_mask[grad_idxs])
        feats = caches["feats"].at[grad_idxs].set(grad_feats)
        head = recogniser.configure_head(
            variables, feats, episode["context_labels"], ctx_mask, num_classes)

        if stats is not None:
            tgt_feats, stats = recogniser.embed_clips(
                variables, tgt_clips, film_values, train=True, with_grad=True,
                collect_stats=True, clip_mask=tgt_mask)
        else:
            tgt_feats = recogniser.embed_clips(
                variables, tgt_clips, film_values, train=train_bn,
                with_grad=True, clip_mask=tgt_mask)
        logits = recogniser.head_logits(head, tgt_feats, episode["class_mask"])

        n_ctx = ctx_mask.astype(jnp.float32).sum()
        scaling = n_ctx / (num_lite * tasks_per_batch)  # single-step-learner.py:231
        is_real = (tgt_mask.sum() > 0).astype(jnp.float32)
        loss = is_real * (scaling * cross_entropy(logits, tgt_labels, tgt_mask)
                          + FILM_REG_WEIGHT * film_l2)
        return loss, (logits, stats)

    def train_task_lite(variables, episode, rng):
        params, rest = _split_variables(variables)
        n = episode["context_clips"].shape[0]
        t = episode["context_clips"].shape[1]

        # ---- per-task no-grad caches (reference: _clear_caches + first-call
        # cache fills, few_shot_recognisers.py:305-311,404-437) ----
        nograd_vars = {"params": params, **rest}
        caches = {}
        cache_film = None
        if recogniser.adapt_features:
            frames = episode["context_clips"].reshape(n * t, *episode["context_clips"].shape[2:])
            caches["reps"] = jax.lax.stop_gradient(
                recogniser._encode_set_frames(nograd_vars, frames)).reshape(n, t, -1)
            fm = jnp.repeat(episode["context_mask"].astype(jnp.float32)[:, None], t, axis=1)
            emb = (caches["reps"] * fm[..., None]).sum(axis=(0, 1)) / jnp.maximum(fm.sum(), 1.0)
            cache_film, _ = recogniser.generate_film(nograd_vars, emb)
            cache_film = jax.lax.stop_gradient(cache_film)
        # the cache pass is where the reference's train-mode BN sees the full
        # context, so running stats update here (few_shot_recognisers.py:415-437)
        new_stats = None
        if train_bn:
            feats_cache, new_stats = recogniser.embed_clips(
                nograd_vars, episode["context_clips"], cache_film,
                train=True, with_grad=False, collect_stats=True,
                clip_mask=episode["context_mask"])
            caches["feats"] = jax.lax.stop_gradient(feats_cache)
        else:
            caches["feats"] = jax.lax.stop_gradient(recogniser.embed_clips(
                nograd_vars, episode["context_clips"], cache_film,
                train=train_bn, with_grad=False,
                clip_mask=episode["context_mask"]))

        # ---- scan over target batches, carrying accumulated grads ----
        # Batch boundaries follow the reference exactly (full batches of
        # ``batch_size``, remainder last — single-step-learner.py:223-228;
        # masked-mean CE makes each batch's loss independent of padding).
        # The tail batch is padded only to a multiple of 8, NOT to
        # ``batch_size``: at protocol scale (tgt 128, batch 256) padding the
        # lone batch to 256 made HALF the target fwd+bwd pure pad waste —
        # measured 125.2 -> 84.7 ms/task-step (ViT-B/32 @224, real v5e)
        # when trimmed (PERF.md "LITE train-step bisection").
        m = episode["target_clips"].shape[0]
        nb = (m + batch_size - 1) // batch_size
        tail_rows = m - (nb - 1) * batch_size          # in (0, batch_size]
        tail_bs = min(batch_size, _round_up(tail_rows, 8))
        # the tail joins the scan only when it is EXACTLY batch_size rows;
        # a smaller tail always takes the padded-tail branch, even when
        # _round_up lands on batch_size (batch_size < 8 or within 8 of it —
        # treating that as "full" would reshape rows that don't exist)
        full = nb if tail_rows == batch_size else nb - 1  # full-size batches
        rngs = jax.random.split(rng, nb)

        grad_fn = jax.value_and_grad(batch_loss_fn, has_aux=True)

        def run_batch(stats, rng_b, clips_b, labels_b, mask_b):
            grad_idxs = lite_grad_subset(rng_b, episode["context_mask"], n)
            # differentiated path: fused Pallas fwd+bwd kernels at
            # protocol-scale dispatch batches (rows >= 64), XLA below the
            # measured crossover (train_impl_scope; PERF.md)
            with train_impl_scope(clips_b.shape[0]):
                return grad_fn(params, rest, stats, caches, episode,
                               grad_idxs, clips_b, labels_b, mask_b)

        def body(carry, xs):
            grads_acc, loss_acc, stats = carry
            rng_b, clips_b, labels_b, mask_b = xs
            (loss, (logits, stats)), grads = run_batch(
                stats, rng_b, clips_b, labels_b, mask_b)
            return (tree_add(grads_acc, grads), loss_acc + loss, stats), logits

        # the loss carry must share the episode data's device-varying type
        # under shard_map (scan carry in/out types must match; grads stay
        # replicated because shard_map's AD psums replicated-param
        # cotangents) — deriving the zero from episode data is a no-op
        # outside shard_map. The BN-stat carry starts from the cache pass's
        # update (already episode-derived, hence varying) and accumulates
        # the reference's per-batch subset+target updates.
        loss0 = 0.0 * episode["target_mask"].astype(jnp.float32).sum()
        carry = (tree_zeros_like(params), loss0, new_stats)
        logits_parts = []
        if full:
            nf = full * batch_size
            carry, logits_f = jax.lax.scan(
                body, carry,
                (rngs[:full],
                 episode["target_clips"][:nf].reshape(
                     full, batch_size, *episode["target_clips"].shape[1:]),
                 episode["target_labels"][:nf].reshape(full, batch_size),
                 episode["target_mask"][:nf].reshape(full, batch_size)))
            logits_parts.append(logits_f.reshape(nf, -1))
        grads, loss, new_stats = carry
        if full < nb:                                   # trimmed tail batch
            pad = tail_bs - tail_rows
            tc = episode["target_clips"][full * batch_size:]
            tl = episode["target_labels"][full * batch_size:]
            tm = episode["target_mask"][full * batch_size:]
            if pad:
                tc = jnp.concatenate(
                    [tc, jnp.zeros((pad,) + tc.shape[1:], tc.dtype)])
                tl = jnp.concatenate([tl, jnp.zeros((pad,), tl.dtype)])
                tm = jnp.concatenate([tm, jnp.zeros((pad,), tm.dtype)])
            (tail_loss, (tail_logits, new_stats)), tail_grads = run_batch(
                new_stats, rngs[nb - 1], tc, tl, tm)
            # with no full batches the zero grad tree is dead — use the tail
            # grads directly rather than adding through an 88M-param zeros
            grads = tree_add(grads, tail_grads) if full else tail_grads
            loss = loss + tail_loss
            logits_parts.append(tail_logits[:tail_rows])
        logits = (logits_parts[0] if len(logits_parts) == 1
                  else jnp.concatenate(logits_parts))
        return grads, loss, logits[:m], new_stats

    return jax.jit(train_task_lite) if jit else train_task_lite


def build_eval_fns(recogniser: SingleStepFewShotRecogniser) -> Tuple[Callable, Callable]:
    """Jitted (personalise, predict) for the CLU-VE protocol — eval-mode BN,
    no gradients (single-step-learner.py:245-375)."""

    @jax.jit
    def personalise(variables, context_clips, context_labels, context_mask, class_mask):
        return recogniser.personalise(
            variables, context_clips, context_labels, context_mask,
            class_mask.shape[0], train=False, with_grad=False)

    @jax.jit
    def predict(variables, task_state, clips, class_mask):
        return recogniser.predict(variables, task_state, clips,
                                  class_mask=class_mask, train=False,
                                  with_grad=False)

    return personalise, predict


def build_apply_update(tx) -> Callable:
    """Jitted optimiser application for accumulated gradients.

    All three inputs are dead after the call (the driver reassigns params
    and opt_state and zeroes the accumulator), so they are donated: the
    update mutates the params + Adam-moment buffers in place instead of
    re-allocating the full model+opt-state footprint every
    ``tasks_per_batch`` tasks (VERDICT r4 #6)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_update(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    return apply_update
