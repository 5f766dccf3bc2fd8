from orbit_tpu.ops.mahalanobis import mahalanobis_logits

__all__ = ["mahalanobis_logits"]
