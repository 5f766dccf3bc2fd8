from orbit_tpu.ops.mahalanobis import mahalanobis_logits
from orbit_tpu.ops.mlp_block import fused_mlp_block

# NOTE: the tiny_attention FUNCTION is deliberately not re-exported here —
# binding that name on the package would shadow the `orbit_tpu.ops.
# tiny_attention` SUBMODULE attribute (same name), breaking
# `from orbit_tpu.ops import tiny_attention as module` imports.
from orbit_tpu.ops.tiny_attention import fused_qkv_attention

__all__ = ["fused_mlp_block", "fused_qkv_attention", "mahalanobis_logits"]
