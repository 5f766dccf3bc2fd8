"""MACs / params accounting via XLA cost analysis.

Reference equivalent: utils/ops_counter.py:10-94 (thop-based profiling of
torch modules plus hand-added MACs). On TPU the compiler already knows the
FLOPs of every compiled program, so ``flops_of`` lowers a jitted function and
reads ``cost_analysis()['flops']``; MACs = FLOPs / 2. Results are cached per
(function, input-shape) so each episode bucket is analysed once.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np


def flops_of(fn: Callable, *args, static_argnums=(), **kwargs) -> float:
    """FLOPs of ``fn(*args)`` from XLA cost analysis (lowering only — no
    backend compile, no execution; identical FLOP counts, far cheaper).

    CAVEAT (why the row-interpolation below exists): XLA cost analysis
    counts a while/scan/map BODY ONCE, not times its trip count — a chunked
    program (``lax.map`` over feature batches, scan over grad steps)
    underreports by the trip count. Analyse at single-chunk sizes and
    extrapolate instead of trusting a looped program's number.
    """
    from orbit_tpu.ops.tiny_attention import force_impl

    # trace with the XLA attention path: cost analysis cannot see inside a
    # Pallas custom call, and the fused kernels hide the qkv/MLP GEMMs
    # (~most of a ViT's MACs — which the reference's thop DOES count). The
    # fresh jit below has its own trace, so the execution path's compiled
    # Pallas program is untouched.
    #
    # ``fn`` is usually ALREADY jit-wrapped (learners/steps.py), and jit of
    # an executed jit INLINES the inner cache's jaxpr instead of re-tracing,
    # which would bake the Pallas path in regardless of force_impl (found as
    # a 2-8x MACs skew whenever analysis ran after the driver's warmup
    # execution) — so unwrap to the underlying Python function first.
    fn = getattr(fn, "__wrapped__", fn)
    with force_impl("xla"):
        lowered = jax.jit(fn, static_argnums=static_argnums).lower(*args, **kwargs)
    try:
        analysis = lowered.cost_analysis()
    except Exception:
        analysis = None
    if analysis is None:  # some backends (e.g. the tunneled TPU) only
        analysis = lowered.compile().cost_analysis()  # analyse post-compile
    if isinstance(analysis, list):  # one entry per device program
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0)) if analysis else 0.0


def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


class OpsCounter:
    """Per-task MACs/params tally (reference: utils/ops_counter.py:10-94).

    ``compute_macs(key, fn, *args)`` lowers+analyses ``fn`` once per
    (key, arg-shapes) and adds FLOPs/2 to the current task; ``add_macs`` adds
    hand-computed MACs (the reference peppers these through the classifier
    heads, e.g. classifier_heads.py:221-228).
    """

    def __init__(self, count_backward: bool = False):
        self.backward_multiplier = 2 if count_backward else 1
        self.task_mac_counter = 0.0
        self.task_params_counter = 0
        self.base_params = 0
        self.base_params_break_down: Dict[str, int] = {}
        self._flops_cache: Dict[Tuple, float] = {}

    @property
    def params_break_down(self) -> str:
        return ", ".join(f"{k}: {v:,}" for k, v in self.base_params_break_down.items())

    def set_base_params(self, params_tree) -> None:
        """Record the meta-trained parameter counts, broken down by top-level
        component (reference: set_base_params, ops_counter.py:20-48)."""
        self.base_params_break_down = {
            name: count_params(sub) for name, sub in params_tree.items()
        }
        self.base_params = sum(self.base_params_break_down.values())

    def add_macs(self, macs) -> None:
        self.task_mac_counter += float(macs) * self.backward_multiplier

    def add_params(self, params) -> None:
        self.task_params_counter += int(params)

    def _flops_for(self, key: str, fn: Callable, args, kwargs) -> float:
        # the uint8 wire format lowers with the device-side normalize fused
        # in (models/recognisers.py _maybe_normalize keys on dtype); the
        # reference's MACs boundary is model compute on ALREADY-normalized
        # pixels (its thop hooks see the DataLoader's float output,
        # reference utils/ops_counter.py:79-85), so analyse at a float32
        # signature — "MACs to personalise" is then identical across
        # --host_normalize settings and comparable to the reference
        def promote(x):
            if getattr(x, "dtype", None) == np.uint8:
                return jax.ShapeDtypeStruct(x.shape, np.float32)
            return x

        args, kwargs = jax.tree_util.tree_map(promote, (args, kwargs))
        shapes = tuple(
            (getattr(a, "shape", None), str(getattr(a, "dtype", type(a))))
            for a in jax.tree_util.tree_leaves((args, kwargs))
        )
        cache_key = (key, shapes)
        if cache_key not in self._flops_cache:
            self._flops_cache[cache_key] = flops_of(fn, *args, **kwargs)
        return self._flops_cache[cache_key]

    def interpolated_flops(self, key: str, fn: Callable, args,
                           row_argnums: Tuple[int, ...], n_valid: int,
                           row_axis: int = 0,
                           max_rows: Optional[int] = None) -> float:
        """Protocol-exact FLOPs of ``fn`` at the task's REAL row count.

        Program FLOPs are affine in the row dimension (every HLO op's FLOPs
        is linear in it; row-independent ops form the intercept), so two
        abstract lowerings pin slope and intercept and the task is charged
        ``intercept + slope * n_valid`` — the reference's actual-shape thop
        accounting (reference utils/ops_counter.py:79-85).

        ViT note: the fused Pallas attention (ops/tiny_attention.py) is a
        custom call invisible to cost analysis, so ``flops_of`` re-lowers
        with the XLA attention path (force_impl) — restoring the same
        accounting that was validated against the notebook oracle scale
        (tests/test_macs_oracle_scale.py): qkv/proj GEMMs charged like
        thop's nn.Linear hooks, plus the S^2 attention matmuls (~1%) that
        thop skips.

        The two analysis sizes are capped at ``max_rows`` (the feature-
        extraction chunk size): beyond one chunk the program wraps the
        backbone in ``lax.map``, whose body XLA cost analysis counts ONCE
        regardless of trip count — analysing inside the single-chunk regime
        keeps the count exact and the affine model extrapolates to any task
        size.
        """
        n_padded = args[row_argnums[0]].shape[row_axis]
        if max_rows is not None and max_rows < 2:
            # cannot stay in the single-chunk regime with two distinct sizes
            # (e.g. batch_size <= clip_length): fall back to the padded
            # program's own count, loudly — it misestimates looped programs
            import warnings
            warnings.warn(
                f"MACs row-interpolation disabled for '{key}': the feature "
                f"chunk holds <2 rows (max_rows={max_rows}); charging the "
                "padded program's raw cost analysis, which undercounts "
                "loop trip counts.")
            return self._flops_for(key, fn, args, {})
        n_hi = min(n_padded, max_rows) if max_rows else n_padded
        n_lo = max(n_hi // 2, 1)

        def at_rows(n):
            def leaf_of(a, shrink):
                def leaf(x):
                    shape = list(x.shape)
                    if shrink:
                        shape[row_axis] = n
                    return jax.ShapeDtypeStruct(tuple(shape), x.dtype)
                return jax.tree_util.tree_map(leaf, a)
            sized = tuple(leaf_of(a, i in row_argnums) for i, a in enumerate(args))
            return self._flops_for(key, fn, sized, {})

        flops_hi = at_rows(n_hi)
        if n_hi == n_lo:
            return flops_hi
        flops_lo = at_rows(n_lo)
        if flops_hi <= flops_lo:
            # program FLOPs must grow with rows; a non-monotonic pair means
            # one analysis is broken (e.g. a cached Pallas trace hiding
            # kernels — the jit-unwrap in flops_of guards the known case).
            # Never extrapolate a negative slope silently.
            import warnings
            warnings.warn(
                f"MACs analysis for '{key}' is non-monotonic in rows "
                f"({n_lo}->{flops_lo:.3g}, {n_hi}->{flops_hi:.3g}); charging "
                f"a per-row estimate from the low point instead.")
            return flops_lo * (n_valid / float(n_lo))
        slope = (flops_hi - flops_lo) / float(n_hi - n_lo)
        import os as _os
        if _os.environ.get("ORBIT_DEBUG_MACS"):
            print(f"[macs-debug] key={key} n_padded={n_padded} n_hi={n_hi} "
                  f"n_lo={n_lo} n_valid={n_valid} F_hi={flops_hi/1e6:.1f}M "
                  f"F_lo={flops_lo/1e6:.1f}M charge={(flops_hi + slope * (n_valid - n_hi))/1e6:.1f}M")
        return flops_hi + slope * (n_valid - n_hi)

    def compute_macs(self, key: str, fn: Callable, *args,
                     row_argnums: Optional[Tuple[int, ...]] = None,
                     n_valid: Optional[int] = None, row_axis: int = 0,
                     max_rows: Optional[int] = None, **kwargs) -> None:
        """Charge the MACs of ``fn(*args)``; see ``interpolated_flops`` for
        the row-interpolation mode (``row_argnums``/``n_valid``/``max_rows``).
        """
        if row_argnums is None or n_valid is None:
            self.add_macs(self._flops_for(key, fn, args, kwargs) / 2.0)
            return
        flops = self.interpolated_flops(key, fn, args, row_argnums, n_valid,
                                        row_axis=row_axis, max_rows=max_rows)
        self.add_macs(flops / 2.0)

    def check_for_uncounted_modules(self, _model=None) -> str:
        """API parity with the reference's thop leaf-module audit
        (ops_counter.py:56-69). Compiled-program cost analysis counts every
        op in the executable, so nothing can go uncounted."""
        return ("ops counter: FLOPs read from compiled XLA programs "
                "(cost_analysis) — all operations counted.")

    def get_task_macs(self) -> float:
        return self.task_mac_counter

    def get_task_params(self) -> int:
        return self.base_params + self.task_params_counter

    def task_complete(self) -> None:
        self.task_mac_counter = 0.0
        self.task_params_counter = 0
