"""ReLU MLP with skip connections.

Same topology as the reference MLP (/root/reference/radiance_fields/mlp.py):
at each layer index listed in ``skip_connections`` the original input is
concatenated before the linear layer; ReLU after every layer but the last.
These little MLPs (width 64) batch to (N, 64) matmuls that tile cleanly onto
the TPU MXU.

All modules take a ``dtype`` (compute dtype): params stay fp32, inputs and
weights are cast to ``dtype`` for the matmuls (flax mixed-precision
convention), and the final output is cast back to fp32 so downstream
density/compositing math keeps full precision.  bf16 compute halves the
(N, width) activation residuals autodiff saves for the backward — at the
flagship workload those residuals are GBs — and doubles MXU throughput.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from emernerf_tpu.models.init_utils import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)


class TorchDense(nn.Module):
    """nn.Dense with torch.nn.Linear default initialization."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class MLP(nn.Module):
    out_dims: int
    num_layers: int = 3
    hidden_dims: int = 256
    skip_connections: Tuple[int, ...] = (0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        inp = x
        if self.num_layers == 1:
            return TorchDense(self.out_dims, dtype=self.dtype)(x).astype(
                jnp.float32
            )
        n = self.num_layers
        for i in range(n - 1):
            if i in self.skip_connections and i > 0:
                x = jnp.concatenate([x, inp], axis=-1)
            x = TorchDense(self.hidden_dims, dtype=self.dtype)(x)
            x = nn.relu(x)
        # note: the reference never ReLUs after the final hidden layer twice;
        # last layer is linear with no activation
        return TorchDense(self.out_dims, dtype=self.dtype)(x).astype(
            jnp.float32
        )


class Sequential64(nn.Module):
    """Linear-ReLU-...-Linear stack (the reference's nn.Sequential heads)."""

    widths: Sequence[int]  # hidden widths then output width
    final_sigmoid: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for w in self.widths[:-1]:
            x = TorchDense(w, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = TorchDense(self.widths[-1], dtype=self.dtype)(x).astype(
            jnp.float32
        )
        if self.final_sigmoid:
            x = nn.sigmoid(x)
        return x
