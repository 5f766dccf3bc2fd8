"""Convert pinned torch/timm checkpoints into this framework's param trees.

The reference constructs timm backbones with pinned pretrained URLs
(reference: model/feature_extractors.py:37-79) and loads full-model torch
checkpoints with ``load_state_dict`` (single-step-learner.py:300-302). Here
conversion is explicit and offline:

    python scripts/convert_checkpoint.py --feature_extractor efficientnet_b0 \
        --torch_path tf_efficientnet_b0_aa.pth --out efficientnet_b0.ckpt

then train/test with ``--pretrained_extractor_path efficientnet_b0.ckpt``.

Layout mapping (torch -> flax):
- Conv weight  OIHW -> HWIO (same transpose covers depthwise: (C,1,kh,kw) ->
  (kh,kw,1,C) with feature_group_count)
- Linear weight (out,in) -> kernel (in,out)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats mean/var
- LayerNorm weight/bias -> scale/bias
- timm module paths ``blocks.{s}.{b}.x`` -> ``blocks_{s}_{b}.x`` (flax name
  collision rules prohibit dots)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pt``/``.pth`` (or ``.npz``) state dict as NumPy."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def convert_efficientnet(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """timm tf_efficientnet_{b0,v2_s} state dict -> (params, batch_stats)."""
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    for key, v in sd.items():
        if key.startswith("classifier.") or key.endswith("num_batches_tracked"):
            continue
        key = re.sub(r"^blocks\.(\d+)\.(\d+)\.", r"blocks_\1_\2/", key)
        parts = key.replace(".", "/").split("/")
        prefix, leaf = "/".join(parts[:-1]), parts[-1]
        module = parts[-2] if len(parts) >= 2 else ""
        if module.startswith(("conv", "se")) or "conv" in module:
            if leaf == "weight":
                params[f"{prefix}/kernel"] = _t_conv(v)
            else:
                params[f"{prefix}/{leaf}"] = v
        elif module.startswith("bn"):
            if leaf == "weight":
                params[f"{prefix}/scale"] = v
            elif leaf == "bias":
                params[f"{prefix}/bias"] = v
            elif leaf == "running_mean":
                stats[f"{prefix}/mean"] = v
            elif leaf == "running_var":
                stats[f"{prefix}/var"] = v
            else:  # never drop a source tensor silently
                raise ValueError(f"unmapped efficientnet bn leaf: {key}")
        else:
            raise ValueError(f"unmapped efficientnet key: {key}")
    return _nest(params), _nest(stats)


def convert_vit(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """timm vit_{small,base}_patch32 state dict -> (params, {})."""
    params: Dict[str, np.ndarray] = {}
    for key, v in sd.items():
        if key.startswith(("head.", "pre_logits.", "fc_norm.")):
            continue
        if key == "cls_token":
            params["cls_token"] = v
        elif key == "pos_embed":
            params["pos_embed"] = v
        elif key == "patch_embed.proj.weight":
            params["patch_embed/kernel"] = _t_conv(v)
        elif key == "patch_embed.proj.bias":
            params["patch_embed/bias"] = v
        else:
            key = re.sub(r"^blocks\.(\d+)\.", r"blocks_\1/", key)
            parts = key.replace(".", "/").split("/")
            prefix, leaf = "/".join(parts[:-1]), parts[-1]
            module = parts[-2]
            if module.startswith("norm"):
                params[f"{prefix}/{'scale' if leaf == 'weight' else 'bias'}"] = v
            elif leaf == "weight":
                params[f"{prefix}/kernel"] = _t_linear(v)
            elif leaf == "bias":
                params[f"{prefix}/{leaf}"] = v
            else:
                raise ValueError(f"unmapped vit key: {key}")
    return _nest(params), {}


def convert_vit_npz(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Google 'augreg' big_vision ``.npz`` checkpoint -> our param tree.

    The reference's pinned vit_s_32 / vit_b_32 URLs point at these npz files
    directly (model/feature_extractors.py:49-58) and rely on timm's loader to
    remap them; converting here makes download -> convert work from a fresh
    clone without timm. Every source tensor is either mapped or in the
    explicit skip-list; anything else raises.
    """
    params: Dict[str, np.ndarray] = {}
    used = set()

    def get(key: str) -> np.ndarray:
        used.add(key)
        return np.asarray(sd[key])

    cls = get("cls")
    d = cls.shape[-1]
    params["cls_token"] = cls
    params["pos_embed"] = get("Transformer/posembed_input/pos_embedding")
    params["patch_embed/kernel"] = get("embedding/kernel")  # HWIO already
    params["patch_embed/bias"] = get("embedding/bias")
    params["norm/scale"] = get("Transformer/encoder_norm/scale")
    params["norm/bias"] = get("Transformer/encoder_norm/bias")
    depth = 1 + max(int(k.split("/")[1].split("_")[1]) for k in sd
                    if k.startswith("Transformer/encoderblock_"))
    for i in range(depth):
        p = f"Transformer/encoderblock_{i}"
        t = f"blocks_{i}"
        params[f"{t}/norm1/scale"] = get(f"{p}/LayerNorm_0/scale")
        params[f"{t}/norm1/bias"] = get(f"{p}/LayerNorm_0/bias")
        params[f"{t}/norm2/scale"] = get(f"{p}/LayerNorm_2/scale")
        params[f"{t}/norm2/bias"] = get(f"{p}/LayerNorm_2/bias")
        params[f"{t}/mlp/fc1/kernel"] = get(f"{p}/MlpBlock_3/Dense_0/kernel")
        params[f"{t}/mlp/fc1/bias"] = get(f"{p}/MlpBlock_3/Dense_0/bias")
        params[f"{t}/mlp/fc2/kernel"] = get(f"{p}/MlpBlock_3/Dense_1/kernel")
        params[f"{t}/mlp/fc2/bias"] = get(f"{p}/MlpBlock_3/Dense_1/bias")
        a = f"{p}/MultiHeadDotProductAttention_1"
        # (D, H, Dh) per q/k/v -> one fused (D, 3D) kernel, head-major columns
        # matching Attention's reshape(n, s, 3, H, Dh)
        params[f"{t}/attn/qkv/kernel"] = np.concatenate(
            [get(f"{a}/{m}/kernel").reshape(d, -1) for m in ("query", "key", "value")],
            axis=1)
        params[f"{t}/attn/qkv/bias"] = np.concatenate(
            [get(f"{a}/{m}/bias").reshape(-1) for m in ("query", "key", "value")])
        params[f"{t}/attn/proj/kernel"] = get(f"{a}/out/kernel").reshape(-1, d)
        params[f"{t}/attn/proj/bias"] = get(f"{a}/out/bias")
    leftover = {k for k in sd if k not in used
                and not k.startswith(("head", "pre_logits"))}
    if leftover:
        raise ValueError(f"unmapped augreg-npz keys: {sorted(leftover)[:5]}")
    return _nest(params), {}


def convert_vit_openclip(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """open_clip checkpoint (``open_clip_pytorch_model.bin``, the reference's
    pinned laion2B ViT-B/32 — model/feature_extractors.py:60-66) -> our
    param tree. Only the visual tower is used; the text tower, logit_scale
    and the final image->text projection (``visual.proj``) are dropped, just
    as timm does with ``num_classes=0`` (the reference reads the 768-d
    pre-projection class token). CLIP's patch conv has no bias; ours is
    zero-initialised, numerically identical."""
    params: Dict[str, np.ndarray] = {}
    used = set()

    def get(key: str) -> np.ndarray:
        used.add(key)
        return np.asarray(sd[key])

    cls = get("visual.class_embedding")
    d = cls.shape[-1]
    params["cls_token"] = cls.reshape(1, 1, d)
    params["pos_embed"] = get("visual.positional_embedding")[None]
    params["patch_embed/kernel"] = _t_conv(get("visual.conv1.weight"))
    params["patch_embed/bias"] = np.zeros((d,), np.float32)
    params["norm_pre/scale"] = get("visual.ln_pre.weight")
    params["norm_pre/bias"] = get("visual.ln_pre.bias")
    params["norm/scale"] = get("visual.ln_post.weight")
    params["norm/bias"] = get("visual.ln_post.bias")
    blocks = {int(k.split(".")[3]) for k in sd
              if k.startswith("visual.transformer.resblocks.")}
    for i in sorted(blocks):
        p = f"visual.transformer.resblocks.{i}"
        t = f"blocks_{i}"
        params[f"{t}/norm1/scale"] = get(f"{p}.ln_1.weight")
        params[f"{t}/norm1/bias"] = get(f"{p}.ln_1.bias")
        params[f"{t}/norm2/scale"] = get(f"{p}.ln_2.weight")
        params[f"{t}/norm2/bias"] = get(f"{p}.ln_2.bias")
        params[f"{t}/attn/qkv/kernel"] = _t_linear(get(f"{p}.attn.in_proj_weight"))
        params[f"{t}/attn/qkv/bias"] = get(f"{p}.attn.in_proj_bias")
        params[f"{t}/attn/proj/kernel"] = _t_linear(get(f"{p}.attn.out_proj.weight"))
        params[f"{t}/attn/proj/bias"] = get(f"{p}.attn.out_proj.bias")
        params[f"{t}/mlp/fc1/kernel"] = _t_linear(get(f"{p}.mlp.c_fc.weight"))
        params[f"{t}/mlp/fc1/bias"] = get(f"{p}.mlp.c_fc.bias")
        params[f"{t}/mlp/fc2/kernel"] = _t_linear(get(f"{p}.mlp.c_proj.weight"))
        params[f"{t}/mlp/fc2/bias"] = get(f"{p}.mlp.c_proj.bias")
    leftover = {k for k in sd if k not in used and k.startswith("visual.")
                and k != "visual.proj"}
    if leftover:
        raise ValueError(f"unmapped open_clip visual keys: {sorted(leftover)[:5]}")
    return _nest(params), {}


def convert_extractor(sd: Dict[str, np.ndarray], feature_extractor: str):
    if feature_extractor.startswith("efficientnet"):
        return convert_efficientnet(sd)
    if feature_extractor.startswith("vit"):
        if any(k.startswith("Transformer/") for k in sd):
            return convert_vit_npz(sd)          # augreg big_vision .npz
        if any(k.startswith("visual.") for k in sd):
            return convert_vit_openclip(sd)     # open_clip .bin
        return convert_vit(sd)                  # timm torch layout
    raise ValueError(f"unknown feature_extractor {feature_extractor}")


def _split_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_set_encoder(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference SetEncoder (set_encoders.py:81-120: 5x Sequential[conv, bn,
    relu, maxpool]) -> our conv{i}/norm{i} params. The reference keeps this
    encoder in eval() forever so its BN running stats stay (0, 1) and BN is an
    affine — we map weight/bias onto the _AffineNorm scale/bias and verify the
    stats really are at init."""
    params: Dict[str, np.ndarray] = {}
    for i in range(1, 6):
        layer = f"encoder.layer{i}"
        params[f"conv{i}/kernel"] = _t_conv(sd[f"{layer}.0.weight"])
        params[f"conv{i}/bias"] = sd[f"{layer}.0.bias"]
        params[f"norm{i}/scale"] = sd[f"{layer}.1.weight"]
        params[f"norm{i}/bias"] = sd[f"{layer}.1.bias"]
        mean, var = sd[f"{layer}.1.running_mean"], sd[f"{layer}.1.running_var"]
        if not (np.allclose(mean, 0.0, atol=1e-5) and np.allclose(var, 1.0, atol=1e-5)):
            raise ValueError(
                f"set_encoder {layer} BN stats moved off their init; the "
                "affine-norm mapping assumes eval-mode-forever BN")
    return _nest(params)


def _film_torch_name(path: Tuple[str, ...], feature_extractor: str) -> str:
    """Our film-spec path -> the reference's torch parameter name
    (model/film.py:68-74), e.g. ('blocks_1_0','bn2','scale') ->
    'blocks.1.0.bn2.weight' (efficientnet) / ('blocks_3','norm1','bias') ->
    'blocks.3.norm1.bias' (vit)."""
    *mods, leaf = path
    names = []
    for m in mods:
        if m.startswith("blocks_"):
            names.extend(["blocks"] + m.split("_")[1:])
        else:
            names.append(m)
    return ".".join(names + ["weight" if leaf == "scale" else "bias"])


def convert_film_generator(sd: Dict[str, np.ndarray], film_spec,
                           feature_extractor: str) -> Dict:
    """Reference FilmParameterGenerator (feature_adapters.py:36-64):
    ModuleList of DenseBlocks + ParameterList of regularisers, both indexed by
    the reference's *sorted torch film parameter names*. Map index i -> our
    ``gen__<flax_path>`` / ``reg__<flax_path>`` params."""
    torch_names = {path: _film_torch_name(path, feature_extractor)
                   for path, _ in film_spec}
    order = sorted(torch_names.values())
    idx_of = {name: i for i, name in enumerate(order)}

    params: Dict[str, np.ndarray] = {}
    for path, _ in film_spec:
        i = idx_of[torch_names[path]]
        tag = ".".join(path).replace(".", "_")
        params[f"gen__{tag}/fc1/kernel"] = _t_linear(sd[f"generators.{i}.block.0.weight"])
        params[f"gen__{tag}/fc1/bias"] = sd[f"generators.{i}.block.0.bias"]
        params[f"gen__{tag}/ln/scale"] = sd[f"generators.{i}.block.1.weight"]
        params[f"gen__{tag}/ln/bias"] = sd[f"generators.{i}.block.1.bias"]
        params[f"gen__{tag}/fc2/kernel"] = _t_linear(sd[f"generators.{i}.block.3.weight"])
        params[f"gen__{tag}/fc2/bias"] = sd[f"generators.{i}.block.3.bias"]
        params[f"reg__{tag}"] = sd[f"regularizers.{i}"]
    return _nest(params)


def convert_versa(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference VersaClassifier hyper-nets (classifier_heads.py:121-143):
    weight_processor/bias_processor DenseResidualBlocks."""
    params: Dict[str, np.ndarray] = {}
    for proc in ("weight_processor", "bias_processor"):
        for lin in ("linear1", "linear2", "linear3"):
            params[f"{proc}/{lin}/kernel"] = _t_linear(sd[f"{proc}.{lin}.weight"])
            params[f"{proc}/{lin}/bias"] = sd[f"{proc}.{lin}.bias"]
    return _nest(params)


def convert_recogniser_checkpoint(sd: Dict[str, np.ndarray], recogniser,
                                  variables) -> Dict:
    """Full reference recogniser state_dict (torch.save of
    SingleStep/MultiStepFewShotRecogniser) -> this framework's variables.

    Handles feature_extractor (+BN stats), set_encoder, film_generator and
    the Versa classifier hyper-nets; per-task state (proto/mahalanobis/linear
    heads) is transient in both frameworks and not part of checkpoints.
    """
    ex_params, ex_stats = convert_extractor(
        _split_prefix(sd, "feature_extractor."), recogniser.feature_extractor_name)
    params = dict(variables["params"])
    params["extractor"] = ex_params

    se_sd = _split_prefix(sd, "set_encoder.")
    if se_sd and "set_encoder" in params:
        params["set_encoder"] = convert_set_encoder(se_sd)
    fg_sd = _split_prefix(sd, "film_generator.")
    if fg_sd and "film_generator" in params:
        params["film_generator"] = convert_film_generator(
            fg_sd, recogniser.film_spec, recogniser.feature_extractor_name)
    cls_sd = _split_prefix(sd, "classifier.")
    if cls_sd and "versa" in params:
        params["versa"] = convert_versa(cls_sd)

    out = dict(variables)
    out["params"] = params
    if ex_stats:
        out["batch_stats"] = {**variables.get("batch_stats", {}), "extractor": ex_stats}
    return out


def save_converted(out_path: str, params: Dict, batch_stats: Dict) -> None:
    from orbit_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(out_path, {"params": params, "batch_stats": batch_stats})


def load_pretrained_extractor(variables, path: str):
    """Merge a converted extractor checkpoint into recogniser variables,
    validating tree structure and shapes against the initialised model."""
    import jax

    from orbit_tpu.utils.checkpoint import load_checkpoint

    template = {"params": variables["params"]["extractor"],
                "batch_stats": variables.get("batch_stats", {}).get("extractor", {})}
    restored = load_checkpoint(path, template)
    jax.tree_util.tree_map(
        lambda a, b: (_ for _ in ()).throw(
            ValueError(f"shape mismatch {a.shape} vs {b.shape}"))
        if np.shape(a) != np.shape(b) else None,
        template, restored)
    out = dict(variables)
    out["params"] = {**variables["params"], "extractor": restored["params"]}
    if restored["batch_stats"]:
        out["batch_stats"] = {**variables.get("batch_stats", {}),
                              "extractor": restored["batch_stats"]}
    return out
