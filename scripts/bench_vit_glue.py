#!/usr/bin/env python
"""ViT non-encoder glue bisect: what do patch-embed and the head cost?

PERF.md's attention bisection bounds the non-attention side at 68% MFU
(identity-attention full model) while the isolated MLP stack runs 82% —
~14 points live in patch embed + pos/cls glue + final LN/head + whatever
XLA fails to fuse between blocks. This measures the two non-encoder
pieces in isolation, dispatch-loop + single-readback two-point style
(fori_loop pessimises conv layouts on TPU ~100x, bench_effnet_bisect.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_vit_glue.py
"""
import argparse
import time

import numpy as np


def two_point(fn, args, n1, n2):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        np.asarray(out).ravel()[0]  # tunnel-safe sync (CLAUDE.md)
        return time.perf_counter() - t0

    for attempt in (0, 1):  # tunnel INTERNAL flake: retry once
        try:
            run(2)
            return (run(n2) - run(n1)) / (n2 - n1)
        except Exception as e:
            if attempt:
                raise
            print(f"retry: {type(e).__name__}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--frame", type=int, default=224)
    ap.add_argument("--n1", type=int, default=40)
    ap.add_argument("--n2", type=int, default=200)
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from orbit_tpu.models.backbones.vit import ViT

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, args.frame, args.frame, 3)), jnp.bfloat16)

    vit = ViT(patch_size=32, dim=768, depth=12, num_heads=12,
              dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: vit.init(k, x[:1]))(jax.random.PRNGKey(0))
    full = jax.jit(lambda v, x: vit.apply(v, x))
    dt_full = two_point(full, (variables, x), args.n1, args.n2)
    print(f"full fwd       : {dt_full * 1e3:7.2f} ms/it "
          f"({args.batch / dt_full:8.0f} f/s)", flush=True)

    # patch embed + reshape + cls/pos glue, exactly as the model runs it
    class PatchGlue(nn.Module):
        @nn.compact
        def __call__(self, x):
            n = x.shape[0]
            x = nn.Conv(768, (32, 32), strides=(32, 32), padding="VALID",
                        dtype=jnp.bfloat16, name="patch_embed")(x)
            x = x.reshape(n, -1, 768)
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, 768))
            pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                             (1, x.shape[1] + 1, 768))
            x = jnp.concatenate(
                [jnp.tile(cls.astype(x.dtype), (n, 1, 1)), x], axis=1)
            return x + pos.astype(x.dtype)

    pg = PatchGlue()
    pvars = jax.jit(lambda k: pg.init(k, x[:1]))(jax.random.PRNGKey(0))
    pfn = jax.jit(lambda v, x: pg.apply(v, x))
    dt_patch = two_point(pfn, (pvars, x), args.n1, args.n2)
    print(f"patch-embed+glue: {dt_patch * 1e3:7.2f} ms/it "
          f"({100 * dt_patch / dt_full:5.1f}% of full)", flush=True)

    # final LayerNorm + cls-token slice on precomputed tokens
    tokens = jnp.asarray(rng.standard_normal(
        (args.batch, 50, 768)), jnp.bfloat16)
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    lvars = ln.init(jax.random.PRNGKey(0), tokens)
    lfn = jax.jit(lambda v, t: ln.apply(v, t)[:, 0].astype(jnp.float32))
    dt_head = two_point(lfn, (lvars, tokens), args.n1, args.n2)
    print(f"final LN+cls    : {dt_head * 1e3:7.2f} ms/it "
          f"({100 * dt_head / dt_full:5.1f}% of full)", flush=True)


if __name__ == "__main__":
    main()
