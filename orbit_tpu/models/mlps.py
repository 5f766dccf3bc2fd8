"""Small MLP building blocks used by hyper-network heads and the FiLM
generator (reference equivalents: model/mlps.py:33-63)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DenseResidualBlock(nn.Module):
    """3x Linear with ELU, residual added when in/out dims match
    (reference: model/mlps.py:33-50). Used by the Versa weight/bias
    hyper-networks."""

    out_size: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_size, name="linear1")(x)
        h = nn.elu(h)
        h = nn.Dense(self.out_size, name="linear2")(h)
        h = nn.elu(h)
        h = nn.Dense(self.out_size, name="linear3")(h)
        if x.shape[-1] == h.shape[-1]:
            h = h + x
        return h


class DenseBlock(nn.Module):
    """Linear -> LayerNorm -> ReLU -> Linear (reference: model/mlps.py:52-63).
    Used by the FiLM parameter generators."""

    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_size, name="fc1")(x)
        h = nn.LayerNorm(name="ln")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_size, name="fc2")(h)
