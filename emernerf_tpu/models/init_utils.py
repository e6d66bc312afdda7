"""Initializers matching PyTorch defaults, so training dynamics track the
reference (which relies on torch.nn.Linear / nn.Embedding defaults).

torch.nn.Linear: weight ~ kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in),
1/sqrt(fan_in)); bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch.nn.Embedding: weight ~ N(0, 1).
"""

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_embedding_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)
