"""Golden-activation fingerprints against the REAL pinned checkpoints.

``scripts/make_activation_fingerprints.py`` (run once where the pinned
timm/CLIP checkpoints exist — reference model/feature_extractors.py:37-79)
commits JSON fingerprints under ``data/fingerprints/``; this test replays the
converted Flax forward against each recorded activation vector whenever the
matching state dict is present locally (``ORBIT_TPU_WEIGHTS_DIR``). This is
the non-self-confirming complement to tests/test_torch_parity.py.

Environment-dependent by design: with no fingerprints committed or no local
weights the tests SKIP (visibly), never pass vacuously.
"""
import glob
import hashlib
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
FINGERPRINT_DIR = os.path.join(REPO, "data", "fingerprints")
WEIGHTS_DIR = os.environ.get("ORBIT_TPU_WEIGHTS_DIR", os.path.join(REPO, "pretrained"))

fingerprints = sorted(glob.glob(os.path.join(FINGERPRINT_DIR, "*.json")))


@pytest.mark.skipif(not fingerprints,
                    reason="no committed fingerprints (data/fingerprints/) — "
                           "generate with scripts/make_activation_fingerprints.py "
                           "where the pinned checkpoints exist")
@pytest.mark.parametrize("path", fingerprints,
                         ids=[os.path.basename(p) for p in fingerprints])
def test_flax_forward_reproduces_fingerprint(path):
    import jax

    from orbit_tpu.models.backbones import create_feature_extractor
    from orbit_tpu.models.convert import convert_extractor, load_torch_state_dict
    from make_activation_fingerprints import seeded_input

    with open(path) as f:
        record = json.load(f)

    sd_path = os.path.join(WEIGHTS_DIR, record["state_dict_basename"])
    if not os.path.exists(sd_path):
        pytest.skip(f"pinned checkpoint {record['state_dict_basename']} not "
                    f"present under {WEIGHTS_DIR}")
    with open(sd_path, "rb") as f:
        assert hashlib.sha256(f.read()).hexdigest() == record["state_dict_sha256"], \
            "local state dict differs from the fingerprinted pinned checkpoint"

    sd = load_torch_state_dict(sd_path)
    params, stats = convert_extractor(sd, record["backbone"])
    module, _, _ = create_feature_extractor(record["backbone"])
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    x = seeded_input(record["input_seed"])
    assert list(x.shape) == record["input_shape"]
    out = np.asarray(jax.jit(lambda v, x: module.apply(v, x))(
        jax.tree_util.tree_map(np.asarray, variables), x))

    expected = np.asarray(record["flax_features"], np.float32)
    np.testing.assert_allclose(out[:, :expected.shape[1]], expected,
                               rtol=1e-4, atol=1e-4)
    if "timm_features" in record:
        timm_expected = np.asarray(record["timm_features"], np.float32)
        np.testing.assert_allclose(out[:, :timm_expected.shape[1]], timm_expected,
                                   rtol=2e-3, atol=2e-3)
