"""XLA cost-analysis ops counter (reference: thop-based utils/ops_counter.py)."""
import numpy as np

import jax.numpy as jnp

from orbit_tpu.utils.ops_counter import OpsCounter, count_params, flops_of


def test_flops_of_matmul():
    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)
    f = flops_of(lambda a, b: a @ b, a, b)
    # 2*M*N*K FLOPs (allow fused/rounded variation)
    assert abs(f - 2 * 64 * 128 * 32) / (2 * 64 * 128 * 32) < 0.2


def test_ops_counter_caches_and_accumulates():
    c = OpsCounter()
    a = jnp.zeros((32, 32), jnp.float32)
    c.compute_macs("mm", lambda x: x @ x, a)
    first = c.get_task_macs()
    assert first > 0
    c.compute_macs("mm", lambda x: x @ x, a)   # cached lowering, adds again
    assert c.get_task_macs() == 2 * first
    c.task_complete()
    assert c.get_task_macs() == 0


def test_backward_multiplier_and_params():
    c = OpsCounter(count_backward=True)
    c.add_macs(10)
    assert c.get_task_macs() == 20
    c.set_base_params({"extractor": {"w": np.zeros((3, 4))},
                       "head": {"b": np.zeros((5,))}})
    assert c.base_params == 17
    assert "extractor: 12" in c.params_break_down
