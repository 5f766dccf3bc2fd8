#!/usr/bin/env python
"""Headline benchmark: CLU-VE query-frame throughput on the flagship model.

Measures frames/sec of the personalised predict path (ProtoNets +
EfficientNet-B0, 224px, bfloat16 matmuls / float32 head) on the default JAX
device, and compares against the same XLA program on the host CPU backend —
the stand-in for the reference's PyTorch-CPU testing footprint
(reference README.md:181 says testing fits on CPU; BASELINE.md north star:
>=10x PyTorch-CPU query-frame throughput per chip).

Prints ONE JSON line:
  {"metric": ..., "value": <device frames/sec>, "unit": "frames/sec",
   "vs_baseline": <device fps / host-CPU fps>}
"""
from __future__ import annotations

import json
import time

import numpy as np


def build():
    import jax
    import jax.numpy as jnp

    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser

    recogniser = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0",
        adapt_features=False, classifier="proto", clip_length=1,
        batch_size=256, dtype=jnp.bfloat16)
    variables = recogniser.init(jax.random.PRNGKey(0), frame_size=224)

    def predict(variables, head, clips, class_mask):
        task_state = {"film": None, "head": head, "film_l2": 0.0}
        return recogniser.predict(variables, task_state, clips,
                                  class_mask=class_mask, train=False,
                                  with_grad=False)

    rng = np.random.default_rng(0)
    way = 8
    head = {
        "weight": rng.standard_normal((16, recogniser.output_size)).astype(np.float32),
        "bias": rng.standard_normal((16,)).astype(np.float32),
        "counts": np.ones((16,), np.float32),
    }
    class_mask = (np.arange(16) < way).astype(np.float32)
    return predict, variables, head, class_mask, rng


def measure_fps(device, predict, variables, head, class_mask, clips,
                iters: int, warmup: int = 2) -> float:
    """Two-point throughput measurement.

    On the tunneled TPU, ``block_until_ready`` does not synchronise and a
    host readback costs a ~70 ms round trip, so: enqueue N iterations
    (serialised on-device), force one readback at the end, and difference two
    run lengths to cancel the constant dispatch+RTT overhead.
    """
    import jax

    def run(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(v, h, c, cm)
        np.asarray(out[0, 0])  # single readback -> true completion
        return time.perf_counter() - t0

    with jax.default_device(device):
        v = jax.device_put(variables, device)
        h = jax.device_put(head, device)
        cm = jax.device_put(class_mask, device)
        c = jax.device_put(clips, device)
        fn = jax.jit(predict)
        for _ in range(warmup):
            np.asarray(fn(v, h, c, cm)[0, 0])
        n1, n2 = max(1, iters // 5), iters
        dt = run(n2) - run(n1)
    return clips.shape[0] * (n2 - n1) / max(dt, 1e-9)


def main():
    import jax

    predict, variables, head, class_mask, rng = build()
    device = jax.devices()[0]
    on_accelerator = device.platform != "cpu"

    n_frames = 256 if on_accelerator else 64
    clips = rng.standard_normal((n_frames, 1, 224, 224, 3)).astype(np.float32)
    fps = measure_fps(device, predict, variables, head, class_mask, clips,
                      iters=40 if on_accelerator else 3)

    # Host-CPU reference point (the reference's supported test footprint).
    vs_baseline = 1.0
    if on_accelerator:
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            cpu_clips = clips[:32]
            cpu_fps = measure_fps(cpu, predict, variables, head, class_mask,
                                  cpu_clips, iters=2, warmup=1)
            vs_baseline = fps / cpu_fps
        except Exception:
            vs_baseline = 0.0

    print(json.dumps({
        "metric": "clu_ve_query_fps_efficientnet_b0_224px_bf16",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
