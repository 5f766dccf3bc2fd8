#!/usr/bin/env python
"""EfficientNet forward bisection: where does the eval-path time go?

PERF.md's roofline argues B0's ~9% MFU is structural (narrow channels,
depthwise convs, SE/BN/SiLU glue). This script MEASURES that decomposition
on the real device, the same way the ViT attention bisection was measured
(PERF.md "ViT attention"): time the full forward, then variants with each
suspected tax replaced by (near-)free identities:

  full        the production model (orbit_tpu/models/backbones/efficientnet.py)
  no_se       SqueezeExcite -> identity
  no_dw       depthwise convs -> strided spatial slice (keeps shapes)
  no_bnact    BatchNorm + SiLU -> identity
  convs_only  all three at once (pure conv/matmul lower bound)

Each variant is timed with an async dispatch loop + single readback,
two-point style so the constant dispatch/RTT overhead cancels (bench.py's
measure_fps methodology). NOT a fori_loop: convolution models inside a
lax.fori_loop body compile ~100x slower on TPU (measured 6.0 ms/it
dispatched vs ~600 ms/it looped for the identical B0 forward — XLA
pessimises conv layouts inside while-loop bodies), so the loop trick that
served the ViT attention bisection is unusable here.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_effnet_bisect.py
       [--backbone efficientnet_b0] [--batch 128] [--frame 224]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="efficientnet_b0")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frame", type=int, default=224)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=40)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "no_se", "no_dw", "no_bnact",
                             "convs_only"])
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    import orbit_tpu.models.backbones.efficientnet as eff

    print(f"device: {jax.devices()[0]} (platform {jax.default_backend()})",
          flush=True)

    orig_se = eff.SqueezeExcite.__call__
    orig_bn = eff.MaskedBatchNorm.__call__
    orig_dw = eff.DepthwiseConv.__call__
    orig_silu = eff.nn.silu

    def se_identity(self, x):
        return x

    def bn_identity(self, x, use_running_average=True, mask=None):
        return x

    def dw_skip(self, x):
        # strided spatial slice: keeps output shapes, does ~no compute
        s = self.stride
        return x[:, ::s, ::s, :] if s > 1 else x

    def apply_variant(name):
        eff.SqueezeExcite.__call__ = orig_se
        eff.MaskedBatchNorm.__call__ = orig_bn
        eff.DepthwiseConv.__call__ = orig_dw
        eff.nn.silu = orig_silu
        if name in ("no_se", "convs_only"):
            eff.SqueezeExcite.__call__ = se_identity
        if name in ("no_dw", "convs_only"):
            eff.DepthwiseConv.__call__ = dw_skip
        if name in ("no_bnact", "convs_only"):
            eff.MaskedBatchNorm.__call__ = bn_identity
            eff.nn.silu = lambda x: x

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(
        (args.batch, args.frame, args.frame, 3)), jnp.bfloat16)

    results = {}
    for name in args.variants:
        apply_variant(name)
        m, _, _ = eff.create_efficientnet(args.backbone, dtype=jnp.bfloat16)
        variables = jax.jit(lambda k: m.init(k, x0[:1]))(jax.random.PRNGKey(0))
        fwd = jax.jit(lambda v, x: m.apply(v, x))

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fwd(variables, x0)
            np.asarray(out[0, 0])  # tunnel-safe sync (CLAUDE.md)
            return time.perf_counter() - t0

        for attempt in (0, 1):  # tunnel INTERNAL flake: retry once
            try:
                run(2)  # warm/compile
                dt = (run(args.n2) - run(args.n1)) / (args.n2 - args.n1)
                break
            except Exception as e:
                if attempt:
                    raise
                print(f"retry {name}: {type(e).__name__}", flush=True)
        results[name] = dt
        fps = args.batch / dt
        print(f"{name:11s}: {dt * 1e3:7.2f} ms/it  {fps:9.0f} f/s", flush=True)

    apply_variant("full")  # restore
    if "full" in results:
        base = results["full"]
        for name, dt in results.items():
            if name != "full":
                print(f"{name:11s} saves {100 * (base - dt) / base:5.1f}% "
                      f"of full forward time")


if __name__ == "__main__":
    main()
