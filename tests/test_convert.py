"""Weight-converter tests: fabricate timm-layout torch state dicts (names and
shapes exactly as timm emits them), convert, and require the converted tree to
match the Flax-initialised extractor tree leaf-for-leaf — this catches any
architecture or naming drift between our backbones and the timm originals
the reference pins (model/feature_extractors.py:37-79)."""
import numpy as np
import pytest
import torch

import jax

from orbit_tpu.models.backbones import create_feature_extractor
from orbit_tpu.models.backbones.efficientnet import B0_ARCH
from orbit_tpu.models.convert import (convert_extractor, load_pretrained_extractor,
                                      save_converted)


def fake_timm_efficientnet_b0():
    """timm tf_efficientnet_b0 state dict: names/shapes per timm's
    EfficientNet builder (stem 32, arch from the paper, head 1280)."""
    torch.manual_seed(0)
    sd = {}

    # magnitudes chosen so 17 stacked blocks of random weights stay finite
    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k) * (i * k * k) ** -0.5

    def bn(name, c):
        sd[f"{name}.weight"] = 1.0 + 0.05 * torch.randn(c)
        sd[f"{name}.bias"] = 0.05 * torch.randn(c)
        sd[f"{name}.running_mean"] = 0.05 * torch.randn(c)
        sd[f"{name}.running_var"] = torch.rand(c) * 0.1 + 0.9
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    def se(name, c, rd):
        sd[f"{name}.conv_reduce.weight"] = torch.randn(rd, c, 1, 1) * c ** -0.5
        sd[f"{name}.conv_reduce.bias"] = 0.05 * torch.randn(rd)
        sd[f"{name}.conv_expand.weight"] = torch.randn(c, rd, 1, 1) * rd ** -0.5
        sd[f"{name}.conv_expand.bias"] = 0.05 * torch.randn(c)

    conv("conv_stem", 32, 3, 3)
    bn("bn1", 32)
    in_chs = 32
    for s, (btype, repeats, k, stride, exp, out_chs, se_ratio) in enumerate(B0_ARCH):
        for b in range(repeats):
            p = f"blocks.{s}.{b}"
            if btype == "ds":
                sd[f"{p}.conv_dw.weight"] = torch.randn(in_chs, 1, k, k) * (k * k) ** -0.5
                bn(f"{p}.bn1", in_chs)
                se(f"{p}.se", in_chs, max(1, int(in_chs * se_ratio)))
                conv(f"{p}.conv_pw", out_chs, in_chs, 1)
                bn(f"{p}.bn2", out_chs)
            else:  # ir
                mid = int(in_chs * exp)
                conv(f"{p}.conv_pw", mid, in_chs, 1)
                bn(f"{p}.bn1", mid)
                sd[f"{p}.conv_dw.weight"] = torch.randn(mid, 1, k, k) * (k * k) ** -0.5
                bn(f"{p}.bn2", mid)
                se(f"{p}.se", mid, max(1, int(in_chs * se_ratio)))
                conv(f"{p}.conv_pwl", out_chs, mid, 1)
                bn(f"{p}.bn3", out_chs)
            in_chs = out_chs
    conv("conv_head", 1280, 320, 1)
    bn("bn2", 1280)
    sd["classifier.weight"] = torch.randn(1000, 1280)
    sd["classifier.bias"] = torch.randn(1000)
    return {k: v.float().numpy() for k, v in sd.items()}


def fake_timm_vit_b_32():
    torch.manual_seed(1)
    sd = {}
    d, depth, patches = 768, 12, 49
    sd["cls_token"] = torch.randn(1, 1, d)
    sd["pos_embed"] = torch.randn(1, patches + 1, d)
    sd["patch_embed.proj.weight"] = torch.randn(d, 3, 32, 32)
    sd["patch_embed.proj.bias"] = torch.randn(d)
    for i in range(depth):
        p = f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{p}.{ln}.weight"] = torch.randn(d)
            sd[f"{p}.{ln}.bias"] = torch.randn(d)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * d, d)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * d)
        sd[f"{p}.attn.proj.weight"] = torch.randn(d, d)
        sd[f"{p}.attn.proj.bias"] = torch.randn(d)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * d, d)
        sd[f"{p}.mlp.fc1.bias"] = torch.randn(4 * d)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(d, 4 * d)
        sd[f"{p}.mlp.fc2.bias"] = torch.randn(4 * d // 4)
    sd["norm.weight"] = torch.randn(d)
    sd["norm.bias"] = torch.randn(d)
    sd["head.weight"] = torch.randn(1000, d)
    sd["head.bias"] = torch.randn(1000)
    return {k: v.numpy() for k, v in sd.items()}


def tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): np.shape(v) for k, v in flat}


def test_convert_efficientnet_b0_matches_init(tmp_path):
    module, _, _ = create_feature_extractor("efficientnet_b0")
    init = module.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))

    params, stats = convert_extractor(fake_timm_efficientnet_b0(), "efficientnet_b0")
    assert tree_shapes(params) == tree_shapes(init["params"])
    assert tree_shapes(stats) == tree_shapes(init["batch_stats"])

    # converted weights run through the model
    out = module.apply({"params": jax.tree_util.tree_map(np.asarray, params),
                        "batch_stats": jax.tree_util.tree_map(np.asarray, stats)},
                       np.random.randn(2, 64, 64, 3).astype(np.float32))
    assert out.shape == (2, 1280)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_vit_b_32_matches_init(tmp_path):
    module, _, _ = create_feature_extractor("vit_b_32")
    init = module.init(jax.random.PRNGKey(0), np.zeros((1, 224, 224, 3), np.float32))

    params, _ = convert_vit_checked()
    assert tree_shapes(params) == tree_shapes(init["params"])

    out = module.apply({"params": jax.tree_util.tree_map(np.asarray, params)},
                       np.random.randn(2, 224, 224, 3).astype(np.float32))
    assert out.shape == (2, 768)
    assert np.isfinite(np.asarray(out)).all()


def convert_vit_checked():
    return convert_extractor(fake_timm_vit_b_32(), "vit_b_32")


def test_load_pretrained_extractor_roundtrip(tmp_path):
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser

    rec = SingleStepFewShotRecogniser(feature_extractor_name="efficientnet_b0",
                                      classifier="proto")
    variables = rec.init(jax.random.PRNGKey(0), frame_size=64)
    params, stats = convert_extractor(fake_timm_efficientnet_b0(), "efficientnet_b0")
    path = str(tmp_path / "eb0.ckpt")
    save_converted(path, params, stats)

    merged = load_pretrained_extractor(variables, path)
    leaf = merged["params"]["extractor"]["conv_stem"]["kernel"]
    np.testing.assert_allclose(np.asarray(leaf),
                               np.asarray(params["conv_stem"]["kernel"]))
    # batch_stats merged too
    np.testing.assert_allclose(
        np.asarray(merged["batch_stats"]["extractor"]["bn1"]["mean"]),
        np.asarray(stats["bn1"]["mean"]))
