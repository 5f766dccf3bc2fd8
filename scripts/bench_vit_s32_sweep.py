#!/usr/bin/env python
"""ViT-S/32 kernel block-geometry sweep (round-5 verdict item 2).

ViT-S/32 ran 41.7% MFU vs its sibling ViT-B/32's 59.8% on the SAME fused
Pallas kernels (BENCH_r04.json) — and the kernels' batch-block size
(`_BLOCK_B = 8`) was tuned entirely at D=768/H=12. At D=384/H=6 every
per-grid-cell GEMM is half-width: the qkv projection is (8*50, 384) @
(384, 1152) — a quarter of B/32's per-cell FLOPs against the same per-cell
overheads. This sweep re-measures eval throughput across block sizes for
the attention and MLP kernels independently, on the real device, using the
same two-point methodology as bench.py.

Block-diagonal redundancy caveat: the attention kernel's row-stacking
trick computes nb-fold redundant masked score FLOPs, so bigger attention
blocks trade MXU shape against wasted score work; the MLP kernel has no
such redundancy and should only gain from fatter row blocks (VMEM
permitting — forward kernels run under Mosaic's default 16 MB scoped-vmem
budget).

Usage: python scripts/bench_vit_s32_sweep.py [--backbone vit_s_32]
         [--batch 512] [--blocks 8 16 32] [--iters 40]
"""
import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="vit_s_32")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--blocks", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--iters", type=int, default=40)
    cli = ap.parse_args()

    import jax

    from orbit_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(os.environ.get("ORBIT_COMPILE_CACHE",
                                        "~/.cache/orbit_tpu/xla"))
    import ml_dtypes

    import bench
    from orbit_tpu.ops import mlp_block as mb
    from orbit_tpu.ops import tiny_attention as ta

    device = jax.devices()[0]
    print(f"backbone={cli.backbone} batch={cli.batch} device={device}",
          flush=True)
    predict, variables, head, class_mask, rng = bench.build(
        cli.backbone, cli.batch)
    clips = rng.standard_normal((cli.batch, 1, 224, 224, 3)).astype(
        ml_dtypes.bfloat16)

    results = {}
    for ab, mbb in itertools.product(cli.blocks, cli.blocks):
        ta._BLOCK_B, mb._BLOCK_B_OVERRIDE = ab, mbb
        jax.clear_caches()
        for attempt in (0, 1):
            try:
                fps = bench.measure_fps(device, predict, variables, head,
                                        class_mask, clips, iters=cli.iters)
                results[(ab, mbb)] = fps
                print(f"attn_block={ab:3d} mlp_block={mbb:3d}: "
                      f"{fps:10.1f} f/s", flush=True)
                break
            except Exception as e:  # transient tunnel INTERNAL: retry once
                if attempt:
                    print(f"attn_block={ab:3d} mlp_block={mbb:3d}: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)
                else:
                    print(f"retry ({type(e).__name__})", flush=True)
    ta._BLOCK_B, mb._BLOCK_B_OVERRIDE = 8, None
    if results:
        (ab, mbb), best = max(results.items(), key=lambda kv: kv[1])
        base = results.get((8, 8))
        print(f"best: attn={ab} mlp={mbb} {best:.1f} f/s"
              + (f" ({best / base:.3f}x vs 8/8)" if base else ""))


if __name__ == "__main__":
    main()
