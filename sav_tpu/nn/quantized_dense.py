"""Dense layer with an int8 forward path (experimental).

Parameter-compatible with ``nn.Dense`` (same 'kernel'/'bias' leaves and
initializers) so quantization can be toggled on existing checkpoints. The
forward runs dynamic symmetric int8 through the MXU's double-rate path
(``sav_tpu.ops.quantized``); the backward is a straight-through estimator.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from sav_tpu.ops import quantized as quantized_ops
from sav_tpu.ops.int8_matmul_kernel import int8_dense_fused


class QuantizedDense(nn.Module):
    """Drop-in ``nn.Dense`` with int8 forward when ``quantized=True``."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    quantized: bool = True
    # fused=True quantizes activations INSIDE the Pallas matmul kernel
    # (sav_tpu/ops/int8_matmul_kernel.py). Both int8 modes measured SLOWER
    # than bf16 on the full ViT-B train step (bf16 832 / naive 636 / fused
    # 610 img/s at bs=128, docs/PERFORMANCE.md), so both stay opt-in and
    # fused defaults off pending epilogue fusion of bias+activation.
    fused: bool = False

    @nn.compact
    def __call__(self, inputs):
        kernel = self.param('kernel', self.kernel_init,
                            (inputs.shape[-1], self.features),
                            self.param_dtype)
        bias = (self.param('bias', self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        if not self.quantized:
            x = jnp.dot(inputs.astype(self.dtype), kernel.astype(self.dtype))
            if bias is not None:
                x = x + bias.astype(self.dtype)
            return x
        if self.fused:
            return int8_dense_fused(
                inputs.astype(self.dtype), kernel,
                bias.astype(self.dtype) if bias is not None else None)
        return quantized_ops.quantized_dense(
            inputs.astype(self.dtype), kernel.astype(jnp.float32),
            bias.astype(self.dtype) if bias is not None else None)
