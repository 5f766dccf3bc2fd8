#!/usr/bin/env python
"""Bisect the protocol-scale LITE train step into measured components.

Round-4 verdict item 1: the 125.2 ms ViT-B/32 LITE step (ctx 256 / tgt 128
/ batch 256 / lite 64 — BENCH_r04.json `vit_b_32_lite_train_task_ms`; the
same shape measured 125.5 ms in round 3's bench_train run) had only a
first-principles explanation for its ~28% useful-FLOP MFU. This script
times identity-bound variants of each component on the real chip, the same
method that found EfficientNet-B0's eval ceiling (PERF.md):

  full         the shipped step (learners/steps.py build_train_task_lite)
  cache        the no-grad context cache pass alone (fwd on ctx rows)
  batch_fwd    one differentiated target batch, VALUE only (no backward):
               grad-subset embed + target embed + head + masked CE
  batch_grad   the same batch under value_and_grad (the real scan body)
  nostats      [BN backbones] batch_grad without BN running-stat threading
  evalbn       [BN backbones] batch_grad with eval-mode BN (running stats,
               no masked batch statistics) — bounds the masked-BN tax

Derived lines: bwd = batch_grad - batch_fwd; glue = full - cache -
batch_grad (scan wrapper, scatter of grad feats into the cache, RNG,
grad-tree zeros/accumulation).

Usage: python scripts/bench_train_bisect.py [--backbone vit_b_32]
       [--ctx 256] [--tgt 128] [--batch 256] [--lite 64] [--way 8]
"""
import argparse
import os
import time
from types import SimpleNamespace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="vit_b_32")
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--tgt", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lite", type=int, default=64)
    ap.add_argument("--frame", type=int, default=224)
    ap.add_argument("--way", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from orbit_tpu.learners import steps as steps_lib
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
    from orbit_tpu.utils.optim import cross_entropy
    from orbit_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(os.environ.get("ORBIT_COMPILE_CACHE",
                                        "~/.cache/orbit_tpu/xla"))
    print(f"backbone={cli.backbone} ctx={cli.ctx} tgt={cli.tgt} "
          f"batch={cli.batch} lite={cli.lite} (reps={cli.reps}) "
          f"devices={jax.devices()}", flush=True)

    args = SimpleNamespace(
        tasks_per_batch=16, learn_extractor=True, with_lite=True,
        num_lite_samples=cli.lite, batch_size=cli.batch,
        optimizer="adam", learning_rate=1e-3, weight_decay=0.0,
        betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name=cli.backbone, adapt_features=False,
        classifier="proto", batch_size=cli.batch, learn_extractor=True,
        num_lite_samples=cli.lite, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: rec.init(k, frame_size=cli.frame))(
        jax.random.PRNGKey(0))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    has_bn = "batch_stats" in variables

    rng = np.random.default_rng(0)
    f = cli.frame

    def clips(n):
        return jnp.asarray(rng.standard_normal((n, 1, f, f, 3)), jnp.bfloat16)

    ep = {
        "context_clips": clips(cli.ctx),
        "context_labels": jnp.asarray(
            rng.integers(0, cli.way, cli.ctx), jnp.int32),
        "context_mask": jnp.ones(cli.ctx, jnp.float32),
        "class_mask": jnp.asarray(np.arange(16) < cli.way, jnp.float32),
        "target_clips": clips(cli.tgt),
        "target_labels": jnp.asarray(
            rng.integers(0, cli.way, cli.tgt), jnp.int32),
        "target_mask": jnp.ones(cli.tgt, jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    # the dispatch width the shipped step actually uses for this shape
    # (tail trim, steps.py): last batch padded to a multiple of 8, not to
    # --batch; here tgt <= batch so it IS the whole target pass
    nb = (cli.tgt + cli.batch - 1) // cli.batch
    tail_rows = cli.tgt - (nb - 1) * cli.batch
    tail_bs = min(cli.batch, ((tail_rows + 7) // 8) * 8)

    # ---------------------------------------------------------- variants ----
    def cache_fn(variables, episode):
        """The step's no-grad context cache pass (steps.py:~265)."""
        if has_bn:
            feats, stats = rec.embed_clips(
                variables, episode["context_clips"], None, train=True,
                with_grad=False, collect_stats=True,
                clip_mask=episode["context_mask"])
            return feats, stats
        return rec.embed_clips(variables, episode["context_clips"], None,
                               train=True, with_grad=False,
                               clip_mask=episode["context_mask"])

    def make_batch_loss(train_bn, collect):
        grad_rows = min(cli.lite, cli.ctx)

        def batch_loss(params, rest, episode, tgt_clips, tgt_labels,
                       tgt_mask, grad_idxs, feats_cache):
            variables = {"params": params, **rest}
            stats = None
            if collect:
                grad_feats, stats = rec.embed_clips(
                    variables, episode["context_clips"][grad_idxs], None,
                    train=True, with_grad=True, collect_stats=True,
                    clip_mask=episode["context_mask"][grad_idxs])
                variables = {**variables,
                             "batch_stats": {**variables["batch_stats"],
                                             "extractor": stats}}
            else:
                grad_feats = rec.embed_clips(
                    variables, episode["context_clips"][grad_idxs], None,
                    train=train_bn, with_grad=True,
                    clip_mask=episode["context_mask"][grad_idxs])
            feats = feats_cache.at[grad_idxs].set(grad_feats)
            head = rec.configure_head(
                variables, feats, episode["context_labels"],
                episode["context_mask"], 16)
            if collect:
                tgt_feats, stats = rec.embed_clips(
                    variables, tgt_clips, None, train=True, with_grad=True,
                    collect_stats=True, clip_mask=tgt_mask)
            else:
                tgt_feats = rec.embed_clips(
                    variables, tgt_clips, None, train=train_bn,
                    with_grad=True, clip_mask=tgt_mask)
            logits = rec.head_logits(head, tgt_feats, episode["class_mask"])
            n_ctx = episode["context_mask"].sum()
            scaling = n_ctx / (cli.lite * args.tasks_per_batch)
            return scaling * cross_entropy(logits, tgt_labels, tgt_mask)

        def fwd(variables, episode, key):
            params = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}
            grad_idxs = jnp.arange(grad_rows)
            fc = jnp.zeros((cli.ctx, rec.output_size), jnp.float32)
            tc = episode["target_clips"][:tail_rows]
            pad = tail_bs - tail_rows
            if pad:
                tc = jnp.concatenate(
                    [tc, jnp.zeros((pad,) + tc.shape[1:], tc.dtype)])
            tl = jnp.concatenate(
                [episode["target_labels"][:tail_rows],
                 jnp.zeros((pad,), jnp.int32)]) if pad else episode["target_labels"]
            tm = jnp.concatenate(
                [episode["target_mask"][:tail_rows],
                 jnp.zeros((pad,), jnp.float32)]) if pad else episode["target_mask"]
            return batch_loss(params, rest, episode, tc, tl, tm,
                              grad_idxs, fc)

        def bwd(variables, episode, key):
            params = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}
            grad_idxs = jnp.arange(grad_rows)
            fc = jnp.zeros((cli.ctx, rec.output_size), jnp.float32)
            tc = episode["target_clips"][:tail_rows]
            pad = tail_bs - tail_rows
            if pad:
                tc = jnp.concatenate(
                    [tc, jnp.zeros((pad,) + tc.shape[1:], tc.dtype)])
            tl = jnp.concatenate(
                [episode["target_labels"][:tail_rows],
                 jnp.zeros((pad,), jnp.int32)]) if pad else episode["target_labels"]
            tm = jnp.concatenate(
                [episode["target_mask"][:tail_rows],
                 jnp.zeros((pad,), jnp.float32)]) if pad else episode["target_mask"]
            # return grads too — returning only the loss lets XLA dead-code
            # -eliminate the whole backward pass out of the program
            loss, grads = jax.value_and_grad(batch_loss)(
                params, rest, episode, tc, tl, tm, grad_idxs, fc)
            return loss, grads

        return fwd, bwd

    full_fn = steps_lib.build_train_task_lite(rec, args, jit=False)

    def timed(name, fn, *fargs):
        for attempt in (0, 1):
            try:
                print(f"compiling {name}...", flush=True)
                c = jax.jit(fn).lower(*fargs).compile()
                out = c(*fargs)
                sync = out[1] if isinstance(out, tuple) else out
                sync = sync if hasattr(sync, "dtype") else jax.tree_util.tree_leaves(sync)[0]
                np.asarray(sync)  # warm + tunnel-safe sync (CLAUDE.md)

                def run(n):
                    t0 = time.perf_counter()
                    o = None
                    for _ in range(n):
                        o = c(*fargs)
                    s = o[1] if isinstance(o, tuple) else o
                    s = s if hasattr(s, "dtype") else jax.tree_util.tree_leaves(s)[0]
                    np.asarray(s)
                    return time.perf_counter() - t0

                n1, n2 = 2, 2 + cli.reps
                dt = (run(n2) - run(n1)) / (n2 - n1)
                print(f"{name:12s} {dt * 1000:8.2f} ms", flush=True)
                return dt
            except Exception as e:  # tunnel INTERNAL: retry once
                if attempt:
                    raise
                print(f"retry {name}: {type(e).__name__}", flush=True)

    print(f"tail_bs={tail_bs}", flush=True)
    t_full = timed("full", full_fn, variables, ep, key)
    t_cache = timed("cache", cache_fn, variables, ep)
    fwd, bwd = make_batch_loss(train_bn=True, collect=has_bn)
    t_bfwd = timed("batch_fwd", fwd, variables, ep, key)
    t_bgrad = timed("batch_grad", bwd, variables, ep, key)
    if has_bn:
        fwd_ns, bwd_ns = make_batch_loss(train_bn=True, collect=False)
        t_ns = timed("nostats", bwd_ns, variables, ep, key)
        fwd_ev, bwd_ev = make_batch_loss(train_bn=False, collect=False)
        t_ev = timed("evalbn", bwd_ev, variables, ep, key)
        print(f"{'stats_tax':12s} {(t_bgrad - t_ns) * 1000:8.2f} ms  "
              f"(BN running-stat threading)")
        print(f"{'maskedbn_tax':12s} {(t_ns - t_ev) * 1000:8.2f} ms  "
              f"(masked batch statistics vs eval BN)")
    print(f"{'bwd_delta':12s} {(t_bgrad - t_bfwd) * 1000:8.2f} ms  "
          f"(backward pass of one target batch)")
    print(f"{'glue':12s} {(t_full - t_cache - t_bgrad) * 1000:8.2f} ms  "
          f"(scan + scatter + RNG + grad-tree zeros)")


if __name__ == "__main__":
    main()
