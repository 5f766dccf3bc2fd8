"""MACs accounting sanity at the challenge oracle's scale.

The getting-started oracle pins 4.78T (±1.27T) MACs to personalise a
ProtoNets ViT-B-32-CLIP task (reference notebook cell 8). ViT-B/32 is
~4.4-4.5 GMACs/frame at 224px, so oracle tasks average ~1000 context
frames. This test runs the REAL personalise program through the ops
counter's row-interpolated accounting (abstract lowerings only — no
compile, no execution) and asserts (a) the per-frame MACs land in the
ViT-B/32 envelope and (b) an oracle-sized task lands inside the notebook's
band. Catches both padding skew and the XLA loop-body undercount (cost
analysis counts a lax.map body once; the counter must analyse inside the
single-chunk regime and extrapolate).
"""
import numpy as np

import jax
import jax.numpy as jnp

from orbit_tpu.learners.steps import build_eval_fns
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from orbit_tpu.utils.ops_counter import OpsCounter

ORACLE_FRAMES = 1080  # ~4.78T / 4.43 GMACs per frame


def test_personalise_macs_at_oracle_scale():
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="vit_b_32_clip", adapt_features=False,
        classifier="proto", batch_size=256)
    # abstract init: shapes only, no math
    variables = jax.eval_shape(
        lambda: rec.init(jax.random.PRNGKey(0), frame_size=224))
    personalise, _ = build_eval_fns(rec)

    n_bucket = 2048
    args = (variables,
            jax.ShapeDtypeStruct((n_bucket, 1, 224, 224, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_bucket,), jnp.int32),
            jax.ShapeDtypeStruct((n_bucket,), jnp.float32),
            jax.ShapeDtypeStruct((16,), jnp.float32))

    counter = OpsCounter()
    counter.compute_macs("personalise", personalise, *args,
                         row_argnums=(1, 2, 3), n_valid=ORACLE_FRAMES,
                         max_rows=rec.batch_size)
    macs = counter.get_task_macs()
    per_frame = macs / ORACLE_FRAMES
    # ViT-B/32 @224: ~4.4 GMACs/frame (49 patches + cls, 12 layers, d=768)
    assert 3.8e9 < per_frame < 5.2e9, f"per-frame MACs {per_frame/1e9:.2f}G off envelope"
    # the oracle-sized task lands in the notebook's 4.78T +/- 1.27T band
    assert 3.51e12 < macs < 6.05e12, f"task MACs {macs/1e12:.2f}T off the oracle band"
