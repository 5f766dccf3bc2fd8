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
    """FLOPs of ``fn(*args)`` from the compiled XLA executable."""
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # one entry per device program
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


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
        shapes = tuple(
            (getattr(a, "shape", None), str(getattr(a, "dtype", type(a))))
            for a in jax.tree_util.tree_leaves((args, kwargs))
        )
        cache_key = (key, shapes)
        if cache_key not in self._flops_cache:
            self._flops_cache[cache_key] = flops_of(fn, *args, **kwargs)
        return self._flops_cache[cache_key]

    def compute_macs(self, key: str, fn: Callable, *args,
                     row_argnums: Optional[Tuple[int, ...]] = None,
                     n_valid: Optional[int] = None, row_axis: int = 0,
                     **kwargs) -> None:
        """Charge the MACs of ``fn(*args)``.

        With ``row_argnums``/``n_valid``, charge the *protocol-exact* MACs of
        the task's REAL row count instead of the padded bucket's: program
        FLOPs are affine in the padded row dimension (every HLO op's FLOPs is
        linear in it, row-independent ops form the intercept), so analysing
        the program at the padded size N and once more at N//2 (abstract
        shapes only — no data, no execution) pins slope and intercept, and
        the task is charged ``intercept + slope * n_valid``. This matches the
        reference's actual-shape thop profiling (reference
        utils/ops_counter.py:79-85) while keeping one compiled program per
        bucket.
        """
        flops = self._flops_for(key, fn, args, kwargs)
        if row_argnums is None or n_valid is None:
            self.add_macs(flops / 2.0)
            return
        n_padded = args[row_argnums[0]].shape[row_axis]
        if n_valid >= n_padded:
            self.add_macs(flops / 2.0)
            return

        def abstract(a, shrink: bool):
            def leaf(x):
                shape = list(x.shape)
                if shrink:
                    shape[row_axis] = max(n_padded // 2, 1)
                return jax.ShapeDtypeStruct(tuple(shape), x.dtype)
            return jax.tree_util.tree_map(leaf, a)

        half = tuple(abstract(a, i in row_argnums) for i, a in enumerate(args))
        flops_half = self._flops_for(key, fn, half, kwargs)
        slope = (flops - flops_half) / float(n_padded - max(n_padded // 2, 1))
        self.add_macs((flops - slope * (n_padded - n_valid)) / 2.0)

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
