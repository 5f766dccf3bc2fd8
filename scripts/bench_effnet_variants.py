#!/usr/bin/env python
"""EfficientNet eval-forward optimisation measurements (round 4).

The bisection (scripts/bench_effnet_bisect.py, PERF.md) measured B0's eval
forward at 5.92 ms/it @ batch 128 with two dominant taxes: XLA's grouped
(depthwise) conv lowering (~51% of step time) and the BN+SiLU glue (~37%,
partly the f32 round-trip the old eval BN path took around every conv).
This script A/Bs the two fixes now implemented in the model:

  dw: xla     lax.conv_general_dilated grouped conv (production default)
  dw: shift   depthwise as K^2 shifted strided-slice multiply-adds
              (efficientnet.DW_IMPL = "shift"; measured 3x SLOWER — XLA
              materialises each shifted slice; kept selectable for
              measurement)

  (the eval-BN affine fold, masked_bn.py, is unconditional — its effect is
   the residual difference vs the round-3 bisect baseline of 5.92 ms)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_effnet_variants.py
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
    ap.add_argument("--dw", nargs="+", default=["xla", "shift"],
                    help="DW_IMPL lowerings to A/B; also accepts 'fused' "
                         "(DW_FUSED=True: Pallas MBConv-tail kernel, "
                         "ops/depthwise.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import orbit_tpu.models.backbones.efficientnet as eff

    print(f"device: {jax.devices()[0]} (platform {jax.default_backend()})",
          flush=True)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(
        (args.batch, args.frame, args.frame, 3)), jnp.bfloat16)

    results = {}
    outs = {}
    for impl in args.dw:
        eff.DW_IMPL = impl if impl != "fused" else "xla"
        eff.DW_FUSED = impl == "fused"
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
                print(f"retry {impl}: {type(e).__name__}", flush=True)
        results[impl] = dt
        outs[impl] = np.asarray(fwd(variables, x0)).astype(np.float32)
        fps = args.batch / dt
        print(f"dw={impl:6s}: {dt * 1e3:7.2f} ms/it  {fps:9.0f} f/s",
              flush=True)

    eff.DW_IMPL = "xla"  # restore defaults
    eff.DW_FUSED = False
    if len(outs) == 2:
        a, b = outs.values()
        rel = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
        print(f"max output diff between lowerings: {rel:.2e} (bf16 reorder)")
    if "xla" in results:
        base = results["xla"]
        for impl, dt in results.items():
            if impl != "xla":
                print(f"dw={impl}: {base / dt:5.2f}x vs xla lowering")


if __name__ == "__main__":
    main()
