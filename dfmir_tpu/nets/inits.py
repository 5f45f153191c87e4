"""Weight initializers matching the reference's init_weights semantics
(/root/reference/models/networks.py:163-215) plus torch's default conv init.

Flax conv kernels are (.. spatial .., in_ch, out_ch); torch fan conventions:
fan_in = in_ch * prod(kernel), fan_out = out_ch * prod(kernel).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _fans(shape):
    rf = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * rf
    fan_out = shape[-1] * rf
    return fan_in, fan_out


def normal_init(init_gain=0.02):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * init_gain
    return init


def xavier_normal_init(init_gain=0.02):
    """torch.nn.init.xavier_normal_(w, gain): std = gain * sqrt(2/(fi+fo))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = init_gain * np.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std
    return init


def kaiming_normal_init():
    """torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        std = np.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std
    return init


def orthogonal_init(init_gain=0.02):
    def init(key, shape, dtype=jnp.float32):
        flat_shape = (int(np.prod(shape[:-1])), shape[-1])
        q = jax.nn.initializers.orthogonal(scale=init_gain)(key, flat_shape, dtype)
        return q.reshape(shape)
    return init


def torch_default_conv_init():
    """torch Conv default (kaiming_uniform a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_default_bias_init(fan_in: int):
    """torch Conv/Linear default bias: U(+-1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def get_initializer(init_type: str, init_gain: float = 0.02):
    """Kernel initializer by the reference's --init_type flag (bias -> zeros)."""
    if init_type == "normal":
        return normal_init(init_gain)
    if init_type == "xavier":
        return xavier_normal_init(init_gain)
    if init_type == "kaiming":
        return kaiming_normal_init()
    if init_type == "orthogonal":
        return orthogonal_init(init_gain)
    if init_type == "torch_default":
        return torch_default_conv_init()
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")
