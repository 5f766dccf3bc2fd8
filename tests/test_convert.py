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


# ----------------------------------------------- alternate source layouts ----
def _vit_tensors(d=16, depth=2, heads=2, patches=4, seed=5):
    """One random draw of ViT weights, returned in BOTH timm-torch layout and
    the same values re-expressed in augreg-npz / open_clip layouts."""
    torch.manual_seed(seed)
    hd = d // heads
    timm_sd, npz, oc = {}, {}, {}
    cls = torch.randn(1, 1, d); pos = torch.randn(1, patches + 1, d)
    pw = torch.randn(d, 3, 8, 8); pb = torch.zeros(d)  # CLIP conv has no bias
    nw, nb = torch.randn(d), torch.randn(d)
    timm_sd.update({"cls_token": cls, "pos_embed": pos,
                    "patch_embed.proj.weight": pw, "patch_embed.proj.bias": pb,
                    "norm.weight": nw, "norm.bias": nb})
    npz.update({"cls": cls, "Transformer/posembed_input/pos_embedding": pos,
                "embedding/kernel": pw.permute(2, 3, 1, 0),
                "embedding/bias": pb,
                "Transformer/encoder_norm/scale": nw,
                "Transformer/encoder_norm/bias": nb})
    oc.update({"visual.class_embedding": cls.reshape(d),
               "visual.positional_embedding": pos[0],
               "visual.conv1.weight": pw,
               "visual.ln_post.weight": nw, "visual.ln_post.bias": nb,
               "visual.ln_pre.weight": torch.ones(d),
               "visual.ln_pre.bias": torch.zeros(d),
               "visual.proj": torch.randn(d, 8)})
    for i in range(depth):
        l1w, l1b = torch.randn(d), torch.randn(d)
        l2w, l2b = torch.randn(d), torch.randn(d)
        qkvw, qkvb = torch.randn(3 * d, d), torch.randn(3 * d)
        prw, prb = torch.randn(d, d), torch.randn(d)
        f1w, f1b = torch.randn(4 * d, d), torch.randn(4 * d)
        f2w, f2b = torch.randn(d, 4 * d), torch.randn(d)
        p = f"blocks.{i}"
        timm_sd.update({f"{p}.norm1.weight": l1w, f"{p}.norm1.bias": l1b,
                        f"{p}.norm2.weight": l2w, f"{p}.norm2.bias": l2b,
                        f"{p}.attn.qkv.weight": qkvw, f"{p}.attn.qkv.bias": qkvb,
                        f"{p}.attn.proj.weight": prw, f"{p}.attn.proj.bias": prb,
                        f"{p}.mlp.fc1.weight": f1w, f"{p}.mlp.fc1.bias": f1b,
                        f"{p}.mlp.fc2.weight": f2w, f"{p}.mlp.fc2.bias": f2b})
        e = f"Transformer/encoderblock_{i}"
        a = f"{e}/MultiHeadDotProductAttention_1"
        npz.update({f"{e}/LayerNorm_0/scale": l1w, f"{e}/LayerNorm_0/bias": l1b,
                    f"{e}/LayerNorm_2/scale": l2w, f"{e}/LayerNorm_2/bias": l2b,
                    f"{e}/MlpBlock_3/Dense_0/kernel": f1w.t(),
                    f"{e}/MlpBlock_3/Dense_0/bias": f1b,
                    f"{e}/MlpBlock_3/Dense_1/kernel": f2w.t(),
                    f"{e}/MlpBlock_3/Dense_1/bias": f2b,
                    f"{a}/query/kernel": qkvw[:d].t().reshape(d, heads, hd),
                    f"{a}/key/kernel": qkvw[d:2 * d].t().reshape(d, heads, hd),
                    f"{a}/value/kernel": qkvw[2 * d:].t().reshape(d, heads, hd),
                    f"{a}/query/bias": qkvb[:d].reshape(heads, hd),
                    f"{a}/key/bias": qkvb[d:2 * d].reshape(heads, hd),
                    f"{a}/value/bias": qkvb[2 * d:].reshape(heads, hd),
                    f"{a}/out/kernel": prw.t().reshape(heads, hd, d),
                    f"{a}/out/bias": prb})
        r = f"visual.transformer.resblocks.{i}"
        oc.update({f"{r}.ln_1.weight": l1w, f"{r}.ln_1.bias": l1b,
                   f"{r}.ln_2.weight": l2w, f"{r}.ln_2.bias": l2b,
                   f"{r}.attn.in_proj_weight": qkvw, f"{r}.attn.in_proj_bias": qkvb,
                   f"{r}.attn.out_proj.weight": prw, f"{r}.attn.out_proj.bias": prb,
                   f"{r}.mlp.c_fc.weight": f1w, f"{r}.mlp.c_fc.bias": f1b,
                   f"{r}.mlp.c_proj.weight": f2w, f"{r}.mlp.c_proj.bias": f2b})
    asnp = lambda sd: {k: np.asarray(v.detach().numpy(), np.float32)
                       for k, v in sd.items()}
    return asnp(timm_sd), asnp(npz), asnp(oc)


def _assert_trees_equal(a, b, ignore=()):
    fa, fb = tree_shapes(a), tree_shapes(b)
    assert set(fa) - set(ignore) <= set(fb)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(a)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    for k, v in flat_a.items():
        if jax.tree_util.keystr(k) in ignore:
            continue
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[k]),
                                   err_msg=jax.tree_util.keystr(k))


def test_convert_vit_npz_equals_timm_layout():
    """The reference's pinned vit_s_32/vit_b_32 URLs are augreg .npz files
    (model/feature_extractors.py:49-58); direct npz conversion must agree
    with the timm-torch conversion of the same weights."""
    from orbit_tpu.models.convert import convert_vit, convert_vit_npz

    timm_sd, npz, _ = _vit_tensors()
    p_timm, _ = convert_vit(timm_sd)
    p_npz, _ = convert_vit_npz(npz)
    _assert_trees_equal(p_timm, p_npz)


def test_convert_vit_openclip_equals_timm_layout():
    """The pinned laion2B ViT-B/32 ships as open_clip_pytorch_model.bin
    (model/feature_extractors.py:60-66); the visual-tower conversion must
    agree with the timm layout (norm_pre comes from ln_pre; visual.proj and
    the text tower are dropped)."""
    from orbit_tpu.models.convert import convert_vit, convert_vit_openclip

    timm_sd, _, oc = _vit_tensors()
    timm_sd["norm_pre.weight"] = np.asarray(oc["visual.ln_pre.weight"])
    timm_sd["norm_pre.bias"] = np.asarray(oc["visual.ln_pre.bias"])
    oc["text.token_embedding.weight"] = np.zeros((4, 4), np.float32)  # dropped
    p_timm, _ = convert_vit(timm_sd)
    p_oc, _ = convert_vit_openclip(oc)
    _assert_trees_equal(p_timm, p_oc)


def test_converters_refuse_silent_key_drops():
    """Converter completeness (round-2 verdict #3c): an unexpected source
    tensor must raise, never vanish."""
    from orbit_tpu.models.convert import convert_vit_npz, convert_vit_openclip

    sd = fake_timm_efficientnet_b0()
    sd["blocks.0.0.bn1.running_median"] = sd["blocks.0.0.bn1.running_mean"]
    with pytest.raises(ValueError, match="bn leaf"):
        convert_extractor(sd, "efficientnet_b0")

    vit = fake_timm_vit_b_32()
    vit["blocks.0.attn.rel_pos"] = np.zeros((3,), np.float32)
    with pytest.raises(ValueError):
        convert_extractor(vit, "vit_b_32")

    _, npz, oc = _vit_tensors()
    npz["Transformer/mystery"] = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="npz"):
        convert_vit_npz(npz)
    oc["visual.mystery"] = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="open_clip"):
        convert_vit_openclip(oc)


def test_convert_extractor_dispatches_on_layout():
    from orbit_tpu.models.convert import convert_extractor as ce

    timm_sd, npz, oc = _vit_tensors()
    _assert_trees_equal(ce(npz, "vit_s_32")[0], ce(timm_sd, "vit_s_32")[0])
    p_oc, _ = ce(oc, "vit_b_32_clip")
    assert "norm_pre" in p_oc
