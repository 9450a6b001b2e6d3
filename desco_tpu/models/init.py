"""Parameter initializers matching torch.nn.Linear defaults.

torch Linear: W ~ U(-k, k), b ~ U(-k, k) with k = 1/sqrt(fan_in)
(kaiming_uniform(a=sqrt(5)) reduces to this). Matching the init family
keeps train-from-scratch dynamics comparable to the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_params(key, fan_in: int, fan_out: int, *lead: int):
    """(W, b) with optional leading axes (e.g. per edge/node type)."""
    kw, kb = jax.random.split(key)
    k = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))
    w = jax.random.uniform(kw, (*lead, fan_in, fan_out), jnp.float32, -k, k)
    b = jax.random.uniform(kb, (*lead, fan_out), jnp.float32, -k, k)
    return w, b


def mlp_params(key, dims, *lead: int):
    """List of (W, b) for consecutive Linear layers with dims[i]->dims[i+1]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        linear_params(keys[i], dims[i], dims[i + 1], *lead)
        for i in range(len(dims) - 1)
    ]
