"""orbit_tpu — a TPU-native (JAX/XLA/Pallas) framework for few-shot teachable
object recognition, with full capability parity with the microsoft/ORBIT-Dataset
reference stack (see SURVEY.md for the layer map of the reference).

Subpackages
-----------
- ``orbit_tpu.data``     — episodic video pipeline: dataset index, task sampling,
  host-side decode/normalize, fixed-shape padded episodes (reference: ``data/``).
- ``orbit_tpu.models``   — Flax backbones (EfficientNet-B0/V2-S, ViT-S/B-32,
  ViT-B-32-CLIP), FiLM adaptation, set encoders, classifier heads, and the
  single-/multi-step few-shot recognisers (reference: ``model/``).
- ``orbit_tpu.ops``      — fused XLA/Pallas kernels for the hot personalise /
  predict paths.
- ``orbit_tpu.parallel`` — episode-data-parallel scaling over a TPU mesh via
  ``shard_map`` with ICI collectives.
- ``orbit_tpu.utils``    — config/flags, optimisation, evaluation (CLU-VE),
  logging, checkpointing, FLOPs accounting (reference: ``utils/``).
"""

__version__ = "0.1.0"
