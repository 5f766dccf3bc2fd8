#!/usr/bin/env python
"""Micro-benchmark: Pallas vs XLA Mahalanobis logits on the default device.

Decides the default backend of ``orbit_tpu.ops.mahalanobis`` (VERDICT round-1
weak #2): run on the real v5e at the benchmark shapes (C=16 classes, D=1280
features — EfficientNet-B0 — and M = one 200-frame video up to a large
batched-videos query set) and record the numbers in the module docstring.

    python scripts/bench_mahalanobis.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, args, iters=20):
    import jax

    args = jax.device_put(args)  # keep operands resident on the device
    f = jax.jit(fn)
    np.asarray(f(*args))  # compile + warmup
    np.asarray(f(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(*args)
        np.asarray(out)  # readback = true sync through the tunnel
        return time.perf_counter() - t0

    n1, n2 = max(1, iters // 5), iters
    # medians over 3 repeats: the tunnel's ~70 ms RTT jitter would otherwise
    # swamp sub-ms kernels
    d1 = min(run(n1) for _ in range(3))
    d2 = min(run(n2) for _ in range(3))
    return (d2 - d1) / (n2 - n1)


def main():
    import functools

    import jax

    from orbit_tpu.ops.mahalanobis import mahalanobis_logits

    c, d = 16, 1280
    rng = np.random.default_rng(0)
    means = rng.standard_normal((c, d)).astype(np.float32)
    a = rng.standard_normal((c, d, d)).astype(np.float32) * 0.05
    precisions = np.einsum("cde,cfe->cdf", a, a) + np.eye(d, dtype=np.float32)
    class_mask = (np.arange(c) < 12).astype(np.float32)

    print(f"device: {jax.devices()[0]}")
    for m in (256, 512, 1024, 2048):
        feats = rng.standard_normal((m, d)).astype(np.float32)
        args = (feats, means, precisions, class_mask)
        row = [f"M={m:5d}"]
        outs = {}
        for backend in ("xla", "pallas"):
            fn = functools.partial(mahalanobis_logits, logit_scale=1.0,
                                   force=backend)
            try:
                dt = measure(fn, args, iters=150 if m <= 512 else 60)
                outs[backend] = np.asarray(jax.jit(fn)(*args))
                tflops = 2 * m * d * d * c / dt / 1e12
                row.append(f"{backend}: {dt * 1e3:7.2f} ms ({tflops:5.1f} TF/s)")
            except Exception as e:
                row.append(f"{backend}: FAILED {type(e).__name__}: {e}")
        if len(outs) == 2:
            err = np.abs(outs["xla"] - outs["pallas"])[:, :12].max()
            row.append(f"max|diff|={err:.2e}")
        print("  ".join(row))


if __name__ == "__main__":
    main()
