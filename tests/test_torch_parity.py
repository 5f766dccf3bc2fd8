"""Numerical parity of the Flax backbones against independent PyTorch
reference forwards built from timm's documented semantics (TF-SAME padding,
BN eps 1e-3, exact GELU, pre-norm attention blocks), running the SAME
weights through both. This is the offline stand-in for golden-activation
tests against the pinned timm checkpoints (SURVEY.md §7 hard part 2) — any
architectural drift (padding, eps, pooling, head ordering) fails here.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from orbit_tpu.models.backbones import create_feature_extractor
from orbit_tpu.models.backbones.efficientnet import B0_ARCH
from orbit_tpu.models.convert import convert_extractor
from tests.test_convert import fake_timm_efficientnet_b0, fake_timm_vit_b_32


# ------------------------------------------------------------------ ViT ----
def torch_vit_b32_forward(sd, x):
    """timm vit_base_patch32_224 forward (num_classes=0, token pooling)."""
    sd = {k: torch.as_tensor(v) for k, v in sd.items()}
    n = x.shape[0]
    d, heads, hd = 768, 12, 64
    x = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
                 stride=32)
    x = x.flatten(2).transpose(1, 2)                     # (N, 49, D)
    cls = sd["cls_token"].expand(n, -1, -1)
    x = torch.cat([cls, x], dim=1) + sd["pos_embed"]
    s = x.shape[1]
    for i in range(12):
        p = f"blocks.{i}"
        h = F.layer_norm(x, (d,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"], 1e-6)
        qkv = h @ sd[f"{p}.attn.qkv.weight"].T + sd[f"{p}.attn.qkv.bias"]
        q, k, v = qkv.reshape(n, s, 3, heads, hd).permute(2, 0, 3, 1, 4)
        att = torch.softmax((q @ k.transpose(-2, -1)) / math.sqrt(hd), dim=-1)
        o = (att @ v).transpose(1, 2).reshape(n, s, d)
        x = x + o @ sd[f"{p}.attn.proj.weight"].T + sd[f"{p}.attn.proj.bias"]
        h = F.layer_norm(x, (d,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"], 1e-6)
        h = F.gelu(h @ sd[f"{p}.mlp.fc1.weight"].T + sd[f"{p}.mlp.fc1.bias"])
        x = x + h @ sd[f"{p}.mlp.fc2.weight"].T + sd[f"{p}.mlp.fc2.bias"]
    x = F.layer_norm(x, (d,), sd["norm.weight"], sd["norm.bias"], 1e-6)
    return x[:, 0]


def test_vit_b32_matches_torch_reference():
    sd = fake_timm_vit_b_32()
    # bound activations: fabricated weights scaled like trained nets
    for k in list(sd):
        if k.endswith("weight") and sd[k].ndim >= 2:
            sd[k] = sd[k] * 0.02
    module, _, _ = create_feature_extractor("vit_b_32")
    params, _ = convert_extractor(sd, "vit_b_32")

    x = np.random.default_rng(0).standard_normal((2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(module.apply)(
        {"params": jax.tree_util.tree_map(np.asarray, params)}, x))
    theirs = torch_vit_b32_forward(sd, torch.as_tensor(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def torch_vit_b32_clip_forward(sd, x):
    """timm vit_base_patch32_clip_224: pre-norm after patch embed, LN eps
    1e-5 (the laion2b weights the reference pins,
    feature_extractors.py:58-64)."""
    sd = {k: torch.as_tensor(v) for k, v in sd.items()}
    n = x.shape[0]
    d, heads, hd = 768, 12, 64
    x = F.conv2d(x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=32)
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([sd["cls_token"].expand(n, -1, -1), x], dim=1) + sd["pos_embed"]
    x = F.layer_norm(x, (d,), sd["norm_pre.weight"], sd["norm_pre.bias"], 1e-5)
    s = x.shape[1]
    for i in range(12):
        p = f"blocks.{i}"
        h = F.layer_norm(x, (d,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"], 1e-5)
        qkv = h @ sd[f"{p}.attn.qkv.weight"].T + sd[f"{p}.attn.qkv.bias"]
        q, k, v = qkv.reshape(n, s, 3, heads, hd).permute(2, 0, 3, 1, 4)
        att = torch.softmax((q @ k.transpose(-2, -1)) / math.sqrt(hd), dim=-1)
        o = (att @ v).transpose(1, 2).reshape(n, s, d)
        x = x + o @ sd[f"{p}.attn.proj.weight"].T + sd[f"{p}.attn.proj.bias"]
        h = F.layer_norm(x, (d,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"], 1e-5)
        h = F.gelu(h @ sd[f"{p}.mlp.fc1.weight"].T + sd[f"{p}.mlp.fc1.bias"])
        x = x + h @ sd[f"{p}.mlp.fc2.weight"].T + sd[f"{p}.mlp.fc2.bias"]
    x = F.layer_norm(x, (d,), sd["norm.weight"], sd["norm.bias"], 1e-5)
    return x[:, 0]


def test_vit_b32_clip_matches_torch_reference():
    sd = fake_timm_vit_b_32()
    sd["norm_pre.weight"] = np.ones(768, np.float32)
    sd["norm_pre.bias"] = np.zeros(768, np.float32)
    for k in list(sd):
        if k.endswith("weight") and sd[k].ndim >= 2:
            sd[k] = sd[k] * 0.02
    module, _, _ = create_feature_extractor("vit_b_32_clip")
    params, _ = convert_extractor(sd, "vit_b_32_clip")

    x = np.random.default_rng(3).standard_normal((2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(module.apply)(
        {"params": jax.tree_util.tree_map(np.asarray, params)}, x))
    theirs = torch_vit_b32_clip_forward(sd, torch.as_tensor(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


# --------------------------------------------------------- EfficientNet ----
def tf_same_conv(x, w, stride, groups=1):
    """TF-SAME padding convolution (timm Conv2dSame semantics)."""
    ih, iw = x.shape[-2:]
    kh, kw = w.shape[-2:]
    pad_h = max((math.ceil(ih / stride) - 1) * stride + kh - ih, 0)
    pad_w = max((math.ceil(iw / stride) - 1) * stride + kw - iw, 0)
    x = F.pad(x, (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2))
    return F.conv2d(x, w, stride=stride, groups=groups)


def torch_efficientnet_b0_forward(sd, x):
    sd = {k: torch.as_tensor(v) for k, v in sd.items()}

    def bn(x, name):
        return F.batch_norm(x, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
                            sd[f"{name}.weight"], sd[f"{name}.bias"],
                            training=False, eps=1e-3)

    def se(x, name):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = F.silu(F.conv2d(s, sd[f"{name}.conv_reduce.weight"], sd[f"{name}.conv_reduce.bias"]))
        s = torch.sigmoid(F.conv2d(s, sd[f"{name}.conv_expand.weight"], sd[f"{name}.conv_expand.bias"]))
        return x * s

    x = F.silu(bn(tf_same_conv(x, sd["conv_stem.weight"], 2), "bn1"))
    in_chs = 32
    for si, (btype, repeats, k, stride, exp, out_chs, se_ratio) in enumerate(B0_ARCH):
        for bi in range(repeats):
            s = stride if bi == 0 else 1
            p = f"blocks.{si}.{bi}"
            shortcut = x
            if btype == "ds":
                x = F.silu(bn(tf_same_conv(x, sd[f"{p}.conv_dw.weight"], s, groups=in_chs), f"{p}.bn1"))
                x = se(x, f"{p}.se")
                x = bn(F.conv2d(x, sd[f"{p}.conv_pw.weight"]), f"{p}.bn2")
            else:  # ir
                mid = int(in_chs * exp)
                x = F.silu(bn(F.conv2d(x, sd[f"{p}.conv_pw.weight"]), f"{p}.bn1"))
                x = F.silu(bn(tf_same_conv(x, sd[f"{p}.conv_dw.weight"], s, groups=mid), f"{p}.bn2"))
                x = se(x, f"{p}.se")
                x = bn(F.conv2d(x, sd[f"{p}.conv_pwl.weight"]), f"{p}.bn3")
            if s == 1 and in_chs == out_chs:
                x = x + shortcut
            in_chs = out_chs
    x = F.silu(bn(F.conv2d(x, sd["conv_head.weight"]), "bn2"))
    return x.mean(dim=(2, 3))


def fake_timm_efficientnet_v2_s():
    """timm tf_efficientnetv2_s state dict (stem 24, cn/er/ir stages)."""
    from orbit_tpu.models.backbones.efficientnet import V2_S_ARCH

    torch.manual_seed(2)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = (torch.randn(o, i, k, k) * (i * k * k) ** -0.5).numpy()

    def bn(name, c):
        sd[f"{name}.weight"] = (1.0 + 0.05 * torch.randn(c)).numpy()
        sd[f"{name}.bias"] = (0.05 * torch.randn(c)).numpy()
        sd[f"{name}.running_mean"] = (0.05 * torch.randn(c)).numpy()
        sd[f"{name}.running_var"] = (torch.rand(c) * 0.1 + 0.9).numpy()

    def se(name, c, rd):
        sd[f"{name}.conv_reduce.weight"] = (torch.randn(rd, c, 1, 1) * c ** -0.5).numpy()
        sd[f"{name}.conv_reduce.bias"] = (0.05 * torch.randn(rd)).numpy()
        sd[f"{name}.conv_expand.weight"] = (torch.randn(c, rd, 1, 1) * rd ** -0.5).numpy()
        sd[f"{name}.conv_expand.bias"] = (0.05 * torch.randn(c)).numpy()

    conv("conv_stem", 24, 3, 3)
    bn("bn1", 24)
    in_chs = 24
    for s, (btype, repeats, k, stride, exp, out_chs, se_ratio) in enumerate(V2_S_ARCH):
        for b in range(repeats):
            p = f"blocks.{s}.{b}"
            mid = int(in_chs * exp)
            if btype == "cn":
                conv(f"{p}.conv", out_chs, in_chs, k)
                bn(f"{p}.bn1", out_chs)
            elif btype == "er":
                conv(f"{p}.conv_exp", mid, in_chs, k)
                bn(f"{p}.bn1", mid)
                conv(f"{p}.conv_pwl", out_chs, mid, 1)
                bn(f"{p}.bn2", out_chs)
            else:  # ir
                conv(f"{p}.conv_pw", mid, in_chs, 1)
                bn(f"{p}.bn1", mid)
                sd[f"{p}.conv_dw.weight"] = (torch.randn(mid, 1, k, k) * (k * k) ** -0.5).numpy()
                bn(f"{p}.bn2", mid)
                se(f"{p}.se", mid, max(1, int(in_chs * se_ratio)))
                conv(f"{p}.conv_pwl", out_chs, mid, 1)
                bn(f"{p}.bn3", out_chs)
            in_chs = out_chs
    conv("conv_head", 1280, 256, 1)
    bn("bn2", 1280)
    return sd


def torch_efficientnet_v2_s_forward(sd, x):
    from orbit_tpu.models.backbones.efficientnet import V2_S_ARCH

    sd = {k: torch.as_tensor(v) for k, v in sd.items()}

    def bn(x, name):
        return F.batch_norm(x, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
                            sd[f"{name}.weight"], sd[f"{name}.bias"],
                            training=False, eps=1e-3)

    def se(x, name):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = F.silu(F.conv2d(s, sd[f"{name}.conv_reduce.weight"], sd[f"{name}.conv_reduce.bias"]))
        s = torch.sigmoid(F.conv2d(s, sd[f"{name}.conv_expand.weight"], sd[f"{name}.conv_expand.bias"]))
        return x * s

    x = F.silu(bn(tf_same_conv(x, sd["conv_stem.weight"], 2), "bn1"))
    in_chs = 24
    for si, (btype, repeats, k, stride, exp, out_chs, se_ratio) in enumerate(V2_S_ARCH):
        for bi in range(repeats):
            s = stride if bi == 0 else 1
            p = f"blocks.{si}.{bi}"
            shortcut = x
            mid = int(in_chs * exp)
            if btype == "cn":
                x = F.silu(bn(tf_same_conv(x, sd[f"{p}.conv.weight"], s), f"{p}.bn1"))
            elif btype == "er":
                x = F.silu(bn(tf_same_conv(x, sd[f"{p}.conv_exp.weight"], s), f"{p}.bn1"))
                x = bn(F.conv2d(x, sd[f"{p}.conv_pwl.weight"]), f"{p}.bn2")
            else:
                x = F.silu(bn(F.conv2d(x, sd[f"{p}.conv_pw.weight"]), f"{p}.bn1"))
                x = F.silu(bn(tf_same_conv(x, sd[f"{p}.conv_dw.weight"], s, groups=mid), f"{p}.bn2"))
                x = se(x, f"{p}.se")
                x = bn(F.conv2d(x, sd[f"{p}.conv_pwl.weight"]), f"{p}.bn3")
            if s == 1 and in_chs == out_chs:
                x = x + shortcut
            in_chs = out_chs
    x = F.silu(bn(F.conv2d(x, sd["conv_head.weight"]), "bn2"))
    return x.mean(dim=(2, 3))


def test_efficientnet_v2_s_matches_torch_reference():
    sd = fake_timm_efficientnet_v2_s()
    module, _, _ = create_feature_extractor("efficientnet_v2_s")
    params, stats = convert_extractor(sd, "efficientnet_v2_s")

    x = np.random.default_rng(2).standard_normal((1, 65, 65, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(lambda v, x: module.apply(v, x))(
        {"params": jax.tree_util.tree_map(np.asarray, params),
         "batch_stats": jax.tree_util.tree_map(np.asarray, stats)}, x))
    theirs = torch_efficientnet_v2_s_forward(sd, torch.as_tensor(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_efficientnet_b0_matches_torch_reference():
    sd = fake_timm_efficientnet_b0()
    module, _, _ = create_feature_extractor("efficientnet_b0")
    params, stats = convert_extractor(sd, "efficientnet_b0")

    # 65 px: odd size exercises the asymmetric TF-SAME padding on every
    # stride-2 stage (the padding quirk that silently breaks parity)
    x = np.random.default_rng(1).standard_normal((2, 65, 65, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(lambda v, x: module.apply(v, x))(
        {"params": jax.tree_util.tree_map(np.asarray, params),
         "batch_stats": jax.tree_util.tree_map(np.asarray, stats)}, x))
    theirs = torch_efficientnet_b0_forward(sd, torch.as_tensor(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
