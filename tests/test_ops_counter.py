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


def test_row_interpolated_macs_match_unpadded_program():
    """Padded-episode MACs must equal the MACs of an UNPADDED program lowered
    at the real clip count (the challenge metric is protocol-exact; reference
    ops_counter.py:79-85). FLOPs are affine in the row dim, so the two-point
    interpolation must land exactly on the unpadded analysis."""
    w = jnp.zeros((48, 64), jnp.float32)

    def fn(w, x, labels, mask):
        feats = jnp.tanh(x @ w)                    # per-row work
        proto = (feats * mask[:, None]).sum(0)     # per-row work
        return proto @ w.T @ w                     # row-independent intercept

    n_real, n_pad = 11, 32
    x_pad = jnp.zeros((n_pad, 48), jnp.float32)
    labels_pad = jnp.zeros((n_pad,), jnp.int32)
    mask_pad = jnp.zeros((n_pad,), jnp.float32)

    c = OpsCounter()
    c.compute_macs("fn", fn, w, x_pad, labels_pad, mask_pad,
                   row_argnums=(1, 2, 3), n_valid=n_real)
    interpolated = c.get_task_macs()

    x = jnp.zeros((n_real, 48), jnp.float32)
    exact = flops_of(fn, w, x, jnp.zeros((n_real,), jnp.int32),
                     jnp.zeros((n_real,), jnp.float32)) / 2.0
    assert interpolated > 0
    np.testing.assert_allclose(interpolated, exact, rtol=0.02)

    # padded MACs without interpolation are strictly larger
    c2 = OpsCounter()
    c2.compute_macs("fn", fn, w, x_pad, labels_pad, mask_pad)
    assert c2.get_task_macs() > interpolated


def test_chunked_program_macs_not_undercounted():
    """XLA cost analysis counts a lax.map body ONCE regardless of trips;
    with max_rows the counter analyses in the single-chunk regime and
    extrapolates, so a chunked program charges the same MACs as its
    unchunked twin."""
    import jax

    w = jnp.zeros((64, 64), jnp.float32)
    chunk = 16

    def chunked(w, x, labels, mask):
        n = x.shape[0]
        if n <= chunk:
            return jnp.tanh(x @ w).sum(0)
        xs = x.reshape(n // chunk, chunk, 64)
        return jax.lax.map(lambda c: jnp.tanh(c @ w), xs).reshape(n, 64).sum(0)

    def direct(w, x, labels, mask):
        return jnp.tanh(x @ w).sum(0)

    n_valid, n_pad = 100, 128
    args = (w, jnp.zeros((n_pad, 64), jnp.float32),
            jnp.zeros((n_pad,), jnp.int32), jnp.zeros((n_pad,), jnp.float32))

    c = OpsCounter()
    c.compute_macs("chunked", chunked, *args, row_argnums=(1, 2, 3),
                   n_valid=n_valid, max_rows=chunk)
    got = c.get_task_macs()
    exact = flops_of(direct, w, jnp.zeros((n_valid, 64), jnp.float32),
                     jnp.zeros((n_valid,), jnp.int32),
                     jnp.zeros((n_valid,), jnp.float32)) / 2.0
    np.testing.assert_allclose(got, exact, rtol=0.02)

    # without max_rows the looped program's own count is ~n_pad/chunk too low
    c2 = OpsCounter()
    c2.compute_macs("chunked2", chunked, *args)
    assert c2.get_task_macs() < 0.3 * got


def test_row_interpolation_on_recogniser_personalise():
    """End-to-end: the personalise program's interpolated MACs at the real
    clip count match lowering the same program unpadded."""
    import jax

    from orbit_tpu.learners.steps import build_eval_fns
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser

    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=False,
        classifier="proto", batch_size=8, learn_extractor=False)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    personalise, _ = build_eval_fns(rec)

    n_real, n_pad, way = 10, 16, 3

    def ep(n):
        return (jnp.zeros((n, 1, 32, 32, 3), jnp.float32),
                jnp.zeros((n,), jnp.int32),
                jnp.ones((n,), jnp.float32),
                (jnp.arange(16) < way).astype(jnp.float32))

    c = OpsCounter()
    c.compute_macs("personalise", personalise, variables, *ep(n_pad),
                   row_argnums=(1, 2, 3), n_valid=n_real)
    interpolated = c.get_task_macs()
    exact = flops_of(personalise, variables, *ep(n_real)) / 2.0
    assert interpolated > 0
    np.testing.assert_allclose(interpolated, exact, rtol=0.02)


def test_backward_multiplier_and_params():
    c = OpsCounter(count_backward=True)
    c.add_macs(10)
    assert c.get_task_macs() == 20
    c.set_base_params({"extractor": {"w": np.zeros((3, 4))},
                       "head": {"b": np.zeros((5,))}})
    assert c.base_params == 17
    assert "extractor: 12" in c.params_break_down
