#!/usr/bin/env python
"""LITE train-step benchmark: Pallas kernels (fwd only / fwd+bwd) vs XLA.

Times one jitted LITE meta-training task step (the hot loop of
single-step-learner.py --mode train --with_lite) on the default device for
a chosen backbone, across three attention/MLP implementations:

  xla                 pure XLA reference ops
  pallas (bwd=False)  Pallas forward kernels, XLA-recompute backward
  pallas (bwd=True)   Pallas forward AND backward kernels (the default)

Usage: python scripts/bench_train.py [--backbone vit_b_32] [--ctx 64]
       [--tgt 64] [--batch 32] [--lite 16] [--frame 224]
"""
import argparse
import time
from types import SimpleNamespace

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="vit_b_32")
    ap.add_argument("--ctx", type=int, default=64)
    ap.add_argument("--tgt", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lite", type=int, default=16)
    ap.add_argument("--frame", type=int, default=224)
    ap.add_argument("--way", type=int, default=8)
    args_cli = ap.parse_args()
    if not 2 <= args_cli.way <= 16:
        ap.error("--way must be in [2, 16] (the benchmark episode pads "
                 "class logits to 16, like the CLU-VE protocol's max way)")

    import jax
    import jax.numpy as jnp

    from orbit_tpu.learners import steps as steps_lib
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
    from orbit_tpu.ops import tiny_attention as ta

    args = SimpleNamespace(
        tasks_per_batch=16, learn_extractor=True, with_lite=True,
        num_lite_samples=args_cli.lite, batch_size=args_cli.batch,
        optimizer="adam", learning_rate=1e-3, weight_decay=0.0,
        betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name=args_cli.backbone, adapt_features=False,
        classifier="proto", batch_size=args_cli.batch, learn_extractor=True,
        num_lite_samples=args_cli.lite, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: rec.init(k, frame_size=args_cli.frame))(
        jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    f = args_cli.frame
    ep = {
        "context_clips": jnp.asarray(
            rng.standard_normal((args_cli.ctx, 1, f, f, 3)), jnp.bfloat16),
        "context_labels": jnp.asarray(
            rng.integers(0, args_cli.way, args_cli.ctx), jnp.int32),
        "context_mask": jnp.ones(args_cli.ctx, jnp.float32),
        "class_mask": jnp.asarray(np.arange(16) < args_cli.way, jnp.float32),
        "target_clips": jnp.asarray(
            rng.standard_normal((args_cli.tgt, 1, f, f, 3)), jnp.bfloat16),
        "target_labels": jnp.asarray(
            rng.integers(0, args_cli.way, args_cli.tgt), jnp.int32),
        "target_mask": jnp.ones(args_cli.tgt, jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    train_fn = steps_lib.build_train_task_lite(rec, args)

    def timed(impl, pallas_bwd):
        ta._PALLAS_BWD = pallas_bwd
        jax.clear_caches()
        with ta.force_impl(impl):
            fn = jax.jit(train_fn).lower(variables, ep, key).compile()
        for _ in range(2):
            np.asarray(fn(variables, ep, key)[1])  # warm + sync

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(variables, ep, key)
            np.asarray(out[1])  # tunnel-safe sync (CLAUDE.md)
            return time.perf_counter() - t0

        n1, n2 = 2, 10
        dt = (run(n2) - run(n1)) / (n2 - n1)
        loss = float(np.asarray(fn(variables, ep, key)[1]))
        return dt, loss

    for impl, pallas_bwd in (("xla", False), ("pallas", False),
                             ("pallas", True)):
        for attempt in (0, 1):
            try:
                sec, loss = timed(impl, pallas_bwd)
                print(f"{impl:6s} pallas_bwd={pallas_bwd}: "
                      f"{sec*1000:7.1f} ms/task-step  loss={loss:.5f}",
                      flush=True)
                break
            except Exception as e:  # tunnel INTERNAL errors: retry once
                if attempt:
                    raise
                print(f"retry {impl}: {type(e).__name__}", flush=True)
    ta._PALLAS_BWD = True


if __name__ == "__main__":
    main()
