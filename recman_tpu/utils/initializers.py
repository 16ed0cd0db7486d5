"""Weight initializers mirroring the reference numerics (recman/tf/core/utils.py:156-189).

All initializers take a jax PRNG key and return f32 arrays. ``glorot_normal``
and ``he_normal`` draw from a truncated normal (±2σ, like tf.random.
truncated_normal used at utils.py:177,183); the std parameter is that of the
underlying untruncated distribution, matching TF semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def calc_fan(weight_shape):
    """Fan-in/fan-out (reference utils.py:156-165)."""
    if len(weight_shape) == 2:
        fan_in, fan_out = weight_shape
    elif len(weight_shape) in (3, 4):
        in_ch, out_ch = weight_shape[-2:]
        kernel_size = int(np.prod(weight_shape[:-2]))
        fan_in, fan_out = in_ch * kernel_size, out_ch * kernel_size
    else:
        raise ValueError(f"unsupported weight shape {weight_shape}")
    return fan_in, fan_out


def _truncated_normal(key, shape, std, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def glorot_normal(key, shape, gain=1.0, dtype=jnp.float32):
    """Truncated-normal Glorot (reference utils.py:180-183)."""
    fan_in, fan_out = calc_fan(shape)
    std = gain * float(np.sqrt(2.0 / (fan_in + fan_out)))
    return _truncated_normal(key, shape, std, dtype)


def glorot_uniform(key, shape, gain=1.0, dtype=jnp.float32):
    """Uniform Glorot (reference utils.py:186-189)."""
    fan_in, fan_out = calc_fan(shape)
    b = gain * float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)


def he_normal(key, shape, dtype=jnp.float32):
    """Truncated-normal He (reference utils.py:174-177)."""
    fan_in, _ = calc_fan(shape)
    std = float(np.sqrt(2.0 / fan_in))
    return _truncated_normal(key, shape, std, dtype)


def he_uniform(key, shape, dtype=jnp.float32):
    """Uniform He (reference utils.py:168-171)."""
    fan_in, _ = calc_fan(shape)
    b = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)
