"""Few-shot recognisers: functional personalise/predict on fixed-shape episodes.

Reference equivalents: model/few_shot_recognisers.py:46-473. The reference is
a stateful nn.Module (personalise() stores film_dict + head on self); here the
same capability is a pure function pipeline designed for XLA:

    variables = recogniser.init(rng)                      # meta-trained state
    task_state = recogniser.personalise(variables, context, labels, mask)
    logits     = recogniser.predict(variables, task_state, clips)

- Episodes are padded to fixed shapes with validity masks (SURVEY.md §7 hard
  part 1); every mask-sensitive reduction (set-encoder mean, class means,
  covariances, CE) is mask-aware.
- Feature extraction is chunked with ``lax.map`` (eval) or a rematerialised
  scan (train) so memory stays bounded at any episode size — the TPU-native
  replacement for the reference's ``_get_features_in_batches`` Python loop
  (few_shot_recognisers.py:124-153).
- LITE (few_shot_recognisers.py:328-437): the full context is embedded under
  ``stop_gradient`` (forward cost only), a random subset of
  ``num_lite_samples`` clips is re-embedded with gradients and scattered back
  — identical gradient structure to the reference's cache + recompute trick.
- BatchNorm: eval uses running stats everywhere; meta-training with
  ``learn_extractor`` runs the extractor's BN on batch statistics
  (reference: few_shot_recognisers.py:176-183). The LITE running-stat
  schedule is reproduced exactly — cache pass, then per-batch grad-subset +
  target updates threaded through the scan carry (learners/steps.py); the
  earlier once-per-task approximation measured 0.23 running-std of drift
  after 30 tasks (tests/test_lite_bn_drift.py) and was removed.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from orbit_tpu.models import heads as heads_lib
from orbit_tpu.models.backbones import create_feature_extractor
from orbit_tpu.models.film import (
    FilmParameterGenerator, apply_film, film_values_from_initial,
    get_initial_film_values,
)
from orbit_tpu.models.heads import VersaProcessors
from orbit_tpu.models.poolers import mean_pool_clips
from orbit_tpu.models.set_encoder import SET_ENCODER_OUTPUT_SIZE, SetEncoder

TaskState = Dict[str, Any]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass(frozen=True)
class FewShotRecogniser:
    """Config + module container; all methods are pure functions of
    (variables, inputs) and safe to close over in ``jax.jit``."""

    feature_extractor_name: str = "efficientnet_b0"
    adapt_features: bool = False
    classifier: str = "proto"
    clip_length: int = 1
    batch_size: int = 256              # feature-extraction chunk size
    learn_extractor: bool = False
    num_lite_samples: int = 16
    logit_scale: float = 1.0
    dtype: Any = jnp.float32
    # normalization stats for the uint8 wire format (see _maybe_normalize);
    # matches the reference's per-extractor transform choice
    # (data/datasets.py:376-431 + utils/args.py:185-190 auto-selection)
    frame_norm_method: str = "imagenet"

    def __post_init__(self):
        module, output_size, film_spec = create_feature_extractor(
            self.feature_extractor_name, dtype=self.dtype)
        object.__setattr__(self, "extractor", module)
        object.__setattr__(self, "output_size", output_size)
        object.__setattr__(self, "film_spec", tuple(film_spec) if self.adapt_features else ())
        if self.adapt_features:
            object.__setattr__(self, "set_encoder", SetEncoder())
            object.__setattr__(self, "film_generator",
                               FilmParameterGenerator(film_spec=tuple(film_spec)))
        if self.classifier == "versa":
            object.__setattr__(self, "versa", VersaProcessors(feat_dim=output_size))

    # ------------------------------------------------------------- init ----
    def init(self, rng, frame_size: int = 224) -> Dict[str, Any]:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        dummy = jnp.zeros((1, frame_size, frame_size, 3), jnp.float32)
        # jit the module inits: un-jitted flax init executes the whole
        # backbone eagerly, op by op — minutes on CPU for EfficientNet
        ex_vars = jax.jit(self.extractor.init)(k1, dummy)
        params = {"extractor": ex_vars["params"]}
        collections = {k: {"extractor": v} for k, v in ex_vars.items() if k != "params"}
        if self.adapt_features:
            params["set_encoder"] = jax.jit(self.set_encoder.init)(k2, dummy)["params"]
            params["film_generator"] = jax.jit(self.film_generator.init)(
                k3, jnp.zeros((1, SET_ENCODER_OUTPUT_SIZE)))["params"]
        if self.classifier == "versa":
            params["versa"] = jax.jit(self.versa.init)(
                k4, jnp.zeros((2, self.output_size)))["params"]
        return {"params": params, **collections}

    # -------------------------------------------------- feature extraction ----
    def _maybe_normalize(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Device-side pixel normalization, keyed on dtype at TRACE time.

        The uint8 wire format ships raw pixels (data/loader.py
        ``raw_uint8``) — 4x fewer host->device bytes than float32 and 2x
        fewer than bf16 — and this applies the reference's transform
        ((x/255 - mean) / std, data/datasets.py:422-431) on device, where
        XLA fuses it into the first conv's input pipeline. Float inputs
        pass through untouched (the host-normalized path, and every test/
        bench that feeds pre-normalized arrays). The result is cast to the
        backbone compute dtype, exactly like the host path's wire cast."""
        if frames.dtype != jnp.uint8:
            return frames
        from orbit_tpu.data.index import NORMALIZE_STATS
        stats = NORMALIZE_STATS[self.frame_norm_method]
        mean = jnp.asarray(stats["mean"], jnp.float32)
        std = jnp.asarray(stats["std"], jnp.float32)
        x = frames.astype(jnp.float32) / 255.0
        return ((x - mean) / std).astype(self.dtype)

    def _extractor_vars(self, variables, film_values):
        p = apply_film(variables["params"]["extractor"], film_values)
        out = {"params": p}
        if "batch_stats" in variables:
            out["batch_stats"] = variables["batch_stats"]["extractor"]
        return out

    def embed_frames(self, variables, frames: jnp.ndarray,
                     film_values=None, train: bool = False,
                     with_grad: bool = True, collect_stats: bool = False,
                     frame_mask: Optional[jnp.ndarray] = None):
        """(N, H, W, 3) -> (N, D) float32 frame features, chunked to bound
        activation memory (reference: _get_features_in_batches,
        few_shot_recognisers.py:124-153).

        ``collect_stats`` (meta-training with ``learn_extractor``): also
        return the extractor's updated BatchNorm running stats, threaded
        chunk-to-chunk like torch's sequential batch updates (reference:
        _set_batch_norm_state puts the extractor in train() so every forward
        updates running stats). Returns (feats, new_stats) in that case.

        ``frame_mask`` (train mode): per-frame validity weights — padded
        episode rows (and chunk-padding rows) are excluded from BatchNorm
        batch statistics (masked_bn.py), so padded and unpadded episodes see
        identical statistics over the real rows.
        """
        ex_vars = self._extractor_vars(variables, film_values)
        n = frames.shape[0]
        b = min(self.batch_size, n)
        collect = collect_stats and train and "batch_stats" in ex_vars
        mask = None
        if train and frame_mask is not None:
            mask = frame_mask.astype(jnp.float32)

        def run(chunk, m=None):
            # per-chunk device normalization (uint8 wire): the full episode
            # stays uint8 in HBM; only the live chunk expands to the
            # compute dtype, preserving the chunking's memory bound
            out = self.extractor.apply(ex_vars, self._maybe_normalize(chunk),
                                       train=train, mask=m,
                                       **({"mutable": ["batch_stats"]} if train else {}))
            return out[0] if train else out

        def run_stateful(stats, chunk, m=None):
            out, mut = self.extractor.apply(
                {**ex_vars, "batch_stats": stats},
                self._maybe_normalize(chunk), train=True, mask=m,
                mutable=["batch_stats"])
            return jax.lax.stop_gradient(mut["batch_stats"]), out

        new_stats = None
        if n <= b:
            if collect:
                new_stats, feats = run_stateful(ex_vars["batch_stats"], frames, mask)
            else:
                feats = run(frames, mask)
        else:
            n_pad = _round_up(n, b)
            padded = jnp.concatenate(
                [frames, jnp.zeros((n_pad - n,) + frames.shape[1:], frames.dtype)])
            chunks = padded.reshape(n_pad // b, b, *frames.shape[1:])
            if mask is not None:
                # chunk-padding rows get weight 0 alongside the episode's own
                # padded rows
                mask_chunks = jnp.concatenate(
                    [mask, jnp.zeros((n_pad - n,), mask.dtype)]).reshape(n_pad // b, b)
                xs = (chunks, mask_chunks)
                stateful = lambda stats, x: run_stateful(stats, x[0], x[1])
                stateless = lambda x: run(x[0], x[1])
            else:
                xs = chunks
                stateful, stateless = run_stateful, run
            if collect:
                body = jax.checkpoint(stateful) if with_grad else stateful
                new_stats, feats = jax.lax.scan(body, ex_vars["batch_stats"], xs)
                feats = feats.reshape(n_pad, -1)[:n]
            else:
                body = jax.checkpoint(stateless) if with_grad else stateless
                feats = jax.lax.map(body, xs).reshape(n_pad, -1)[:n]
        if not with_grad:
            feats = jax.lax.stop_gradient(feats)
        feats = feats.astype(jnp.float32)
        if collect_stats:
            return feats, new_stats
        return feats

    def embed_clips(self, variables, clips: jnp.ndarray, film_values=None,
                    train: bool = False, with_grad: bool = True,
                    collect_stats: bool = False,
                    clip_mask: Optional[jnp.ndarray] = None):
        """(N, T, H, W, 3) -> (N, D): frame features mean-pooled per clip
        (reference: _get_features + _pool_features). ``clip_mask`` expands to
        a per-frame mask for BatchNorm statistics (train mode only)."""
        n, t = clips.shape[:2]
        frames = clips.reshape(n * t, *clips.shape[2:])
        frame_mask = None
        if clip_mask is not None:
            frame_mask = jnp.repeat(clip_mask.astype(jnp.float32), t)
        out = self.embed_frames(variables, frames, film_values, train,
                                with_grad, collect_stats=collect_stats,
                                frame_mask=frame_mask)
        if collect_stats:
            feats, new_stats = out
            return mean_pool_clips(feats, t), new_stats
        return mean_pool_clips(out, t)

    # ------------------------------------------------------ set encoding ----
    def _encode_set_frames(self, variables, frames: jnp.ndarray) -> jnp.ndarray:
        """Per-frame 64-d reps from the DeepSets encoder, chunked."""
        n = frames.shape[0]
        b = min(self.batch_size, n)
        run = lambda chunk: self.set_encoder.apply(
            {"params": variables["params"]["set_encoder"]},
            self._maybe_normalize(chunk))
        if n <= b:
            return run(frames)
        n_pad = _round_up(n, b)
        padded = jnp.concatenate(
            [frames, jnp.zeros((n_pad - n,) + frames.shape[1:], frames.dtype)])
        chunks = padded.reshape(n_pad // b, b, *frames.shape[1:])
        return jax.lax.map(run, chunks).reshape(n_pad, -1)[:n]

    def task_embedding(self, variables, context_clips: jnp.ndarray,
                       clip_mask: jnp.ndarray) -> jnp.ndarray:
        """Masked-mean DeepSets embedding over all context frames
        (reference: _get_task_embedding_in_batches,
        few_shot_recognisers.py:361-386)."""
        n, t = context_clips.shape[:2]
        frames = context_clips.reshape(n * t, *context_clips.shape[2:])
        reps = self._encode_set_frames(variables, frames)          # (N*T, 64)
        frame_mask = jnp.repeat(clip_mask.astype(jnp.float32), t)
        total = jnp.maximum(frame_mask.sum(), 1.0)
        return (reps * frame_mask[:, None]).sum(axis=0) / total    # (64,)

    # ------------------------------------------------------------- film ----
    def generate_film(self, variables, task_embedding: Optional[jnp.ndarray]):
        """Task embedding -> FiLM leaf overrides + L2 regulariser
        (reference: _generate_film_params, few_shot_recognisers.py:439-451)."""
        if not self.adapt_features:
            return None, jnp.float32(0.0)
        generated, l2 = self.film_generator.apply(
            {"params": variables["params"]["film_generator"]},
            task_embedding.reshape(1, -1))
        initial = get_initial_film_values(
            variables["params"]["extractor"], self.film_spec)
        return film_values_from_initial(initial, generated), l2

    # ----------------------------------------------------------- heads ----
    def configure_head(self, variables, context_features, context_labels,
                       sample_mask, num_classes: int) -> Dict[str, jnp.ndarray]:
        if self.classifier == "versa":
            return heads_lib.configure_versa(
                self.versa, {"params": variables["params"]["versa"]},
                context_features, context_labels, sample_mask, num_classes)
        if self.classifier == "linear":
            return heads_lib.init_linear_head(num_classes, self.output_size)
        return heads_lib.CONFIGURE[self.classifier](
            context_features, context_labels, sample_mask, num_classes)

    def head_logits(self, head, features, class_mask=None) -> jnp.ndarray:
        return heads_lib.PREDICT[self.classifier](
            head, features, logit_scale=self.logit_scale, class_mask=class_mask)


@dataclass(frozen=True)
class SingleStepFewShotRecogniser(FewShotRecogniser):
    """CNAPs/ProtoNets-style: personalise in one forward pass
    (reference: few_shot_recognisers.py:271-473)."""

    def personalise(self, variables, context_clips, context_labels,
                    context_mask, num_classes: int,
                    train: bool = False,
                    with_grad: Optional[bool] = None,
                    collect_stats: bool = False) -> TaskState:
        """Full personalisation: task embedding -> FiLM -> context features ->
        head configure (reference: personalise, few_shot_recognisers.py:313-326).

        ``train`` selects BatchNorm batch-statistics mode (meta-training with
        ``learn_extractor``); ``with_grad`` controls gradient flow through the
        backbone and defaults to ``train`` — they are decoupled because
        meta-training FiLM with a frozen extractor needs grads under eval-mode
        BN (reference: _set_batch_norm_state, few_shot_recognisers.py:176-183).
        """
        if with_grad is None:
            with_grad = train
        film_values, film_l2 = (None, jnp.float32(0.0))
        if self.adapt_features:
            emb = self.task_embedding(variables, context_clips, context_mask)
            film_values, film_l2 = self.generate_film(variables, emb)
        new_stats = None
        if collect_stats:
            feats, new_stats = self.embed_clips(
                variables, context_clips, film_values, train=train,
                with_grad=with_grad, collect_stats=True,
                clip_mask=context_mask)
        else:
            feats = self.embed_clips(variables, context_clips, film_values,
                                     train=train, with_grad=with_grad,
                                     clip_mask=context_mask)
        head = self.configure_head(variables, feats, context_labels,
                                   context_mask, num_classes)
        return {"film": film_values, "head": head, "film_l2": film_l2,
                "batch_stats": new_stats}

    def personalise_with_lite(self, variables, context_clips, context_labels,
                              context_mask, num_classes: int, rng,
                              train: bool = True) -> TaskState:
        """LITE: full context under stop_gradient + a random subset of
        ``num_lite_samples`` clips recomputed with gradients and scattered
        back (reference: personalise_with_lite,
        few_shot_recognisers.py:328-343,388-437)."""
        n = context_clips.shape[0]
        L = min(self.num_lite_samples, n)
        # shuffle valid rows first: valid clips sort before padded ones
        noise = jax.random.uniform(rng, (n,))
        order = jnp.argsort(noise - context_mask.astype(jnp.float32) * 10.0)
        grad_idxs = order[:L]

        film_values, film_l2 = (None, jnp.float32(0.0))
        if self.adapt_features:
            t = context_clips.shape[1]
            frames = context_clips.reshape(n * t, *context_clips.shape[2:])
            reps = jax.lax.stop_gradient(
                self._encode_set_frames(variables, frames)).reshape(n, t, -1)
            grad_frames = context_clips[grad_idxs].reshape(L * t, *context_clips.shape[2:])
            grad_reps = self.set_encoder.apply(
                {"params": variables["params"]["set_encoder"]},
                self._maybe_normalize(grad_frames)).reshape(L, t, -1)
            reps = reps.at[grad_idxs].set(grad_reps)
            frame_mask = jnp.repeat(context_mask.astype(jnp.float32)[:, None], t, axis=1)
            emb = (reps * frame_mask[..., None]).sum(axis=(0, 1)) / jnp.maximum(
                frame_mask.sum(), 1.0)
            film_values, film_l2 = self.generate_film(variables, emb)

        feats = self.embed_clips(variables, context_clips, film_values,
                                 train=train, with_grad=False,
                                 clip_mask=context_mask)
        grad_feats = self.embed_clips(variables, context_clips[grad_idxs],
                                      film_values, train=train, with_grad=True,
                                      clip_mask=context_mask[grad_idxs])
        feats = feats.at[grad_idxs].set(grad_feats)
        head = self.configure_head(variables, feats, context_labels,
                                   context_mask, num_classes)
        return {"film": film_values, "head": head, "film_l2": film_l2,
                "batch_stats": None}

    def predict(self, variables, task_state: TaskState, clips,
                class_mask=None, train: bool = False,
                with_grad: bool = False, collect_stats: bool = False,
                clip_mask=None):
        """Logits for target clips under the personalised state
        (reference: predict / predict_a_batch, few_shot_recognisers.py:453-473)."""
        if collect_stats:
            feats, new_stats = self.embed_clips(
                variables, clips, task_state["film"], train=train,
                with_grad=with_grad, collect_stats=True, clip_mask=clip_mask)
            return self.head_logits(task_state["head"], feats, class_mask), new_stats
        feats = self.embed_clips(variables, clips, task_state["film"],
                                 train=train, with_grad=with_grad,
                                 clip_mask=clip_mask)
        return self.head_logits(task_state["head"], feats, class_mask)


@dataclass(frozen=True)
class MultiStepFewShotRecogniser(FewShotRecogniser):
    """FineTuner: personalise by gradient steps on the context set
    (reference: few_shot_recognisers.py:185-269). The inner optimisation
    lives in ``orbit_tpu.learners.multi_step`` (it needs optax state); this
    class supplies the per-step pieces."""

    def init_task_params(self, variables, num_classes: int) -> Dict[str, Any]:
        """Fresh per-task trainables: zero linear head, plus the current FiLM
        leaves when ``adapt_features`` (reference: init_classifier :263-269,
        unfreeze_film :195-198)."""
        task_params = {"head": heads_lib.init_linear_head(num_classes, self.output_size)}
        if self.adapt_features:
            task_params["film"] = dict(get_initial_film_values(
                variables["params"]["extractor"], self.film_spec))
        return task_params

    def task_logits(self, variables, task_params, clips,
                    class_mask=None, with_grad: bool = True) -> jnp.ndarray:
        film_values = task_params.get("film")
        feats = self.embed_clips(variables, clips, film_values,
                                 train=False, with_grad=with_grad)
        return heads_lib.predict_linear(task_params["head"], feats,
                                        logit_scale=self.logit_scale,
                                        class_mask=class_mask)
