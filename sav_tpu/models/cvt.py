"""CvT: Convolutional vision Transformer (Wu et al., 2021).

Checkpoint- and API-compatible with the reference (models/cvt.py:10-171):
a three-stage pyramid of strided conv token embeddings and conv-projection
attention blocks; the cls token only exists in the last stage.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple, Union

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from sav_tpu.nn import CvTSelfAttentionBlock, FFBlock


def zero_pad_and_reshape(inputs):
    """Pads a ``[B, L, C]`` token sequence to the next square grid.

    Needed because the cls token makes L one more than a perfect square in
    the last stage (reference: models/cvt.py:10-16).
    """
    assert inputs.ndim == 3
    length = inputs.shape[1]
    side = math.isqrt(length)
    if side * side != length:
        side += 1
    inputs = jnp.pad(inputs, ((0, 0), (0, side * side - length), (0, 0)))
    return rearrange(inputs, 'b (H W) c -> b H W c', W=side)


class ConvTokenEmbedBlock(nn.Module):
    """Strided conv embedding + flatten + LayerNorm."""

    out_ch: int
    kernel_size: int
    strides: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, **unused_kwargs):
        assert inputs.ndim == 4
        x = nn.Conv(features=self.out_ch,
                    kernel_size=(self.kernel_size,) * 2,
                    strides=(self.strides,) * 2,
                    padding='SAME',
                    dtype=self.dtype)(inputs)
        x = rearrange(x, 'b H W c -> b (H W) c')
        return nn.LayerNorm(dtype=self.dtype)(x)


class StageBlock(nn.Module):
    """Conv-projection attention + FF, residuals over the token sequence."""

    num_heads: int
    embed_dim: int
    kernel_size: int = 3
    use_bias: bool = False
    activation_fn: Callable = nn.activation.gelu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    expand_ratio: float = 4
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    quantized: Union[bool, str] = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        inputs = zero_pad_and_reshape(inputs)

        x = CvTSelfAttentionBlock(num_heads=self.num_heads,
                                  kernel_size=self.kernel_size,
                                  use_bias=self.use_bias,
                                  bn_momentum=self.bn_momentum,
                                  bn_epsilon=self.bn_epsilon,
                                  dtype=self.dtype,
                                  use_kernel=self.use_kernel)(
                                      inputs, is_training=is_training)

        x = x + rearrange(inputs, 'b h w d -> b (h w) d')

        # int8 FF only where wide enough to beat the quantize passes:
        # measured serving at bs256 @224 (benchmarks/serve_sweep.py r4):
        # bare int8 FFBlock at >=128-ch stages 5169 vs 6448 bf16; at the
        # 384-ch stage only 5383 — the bare boundary un-fuses LN from W1
        # (the round-3 integration receipt), so the remaining candidate
        # is the LN-inside sublayer span, same shape ViT serves with.
        quantize_ff = (self.quantized in ('ff', 'all')
                       and self.embed_dim >= 256
                       and self.activation_fn is nn.activation.gelu)
        if quantize_ff:
            from sav_tpu.nn.attention import LayerNormParams
            from sav_tpu.nn.feedforward import FFParams
            from sav_tpu.ops import int8_ff
            dim = x.shape[-1]
            s, b = LayerNormParams(dim, name='LayerNorm_0')()
            w1, b1, w2, b2 = FFParams(
                dim, max(1, int(self.expand_ratio * dim)),
                name='FFBlock_0')()
            return int8_ff.int8_ff_sublayer(
                x.astype(self.dtype), s, b, w1, b1, w2, b2)

        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = FFBlock(expand_ratio=self.expand_ratio,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype)(y, is_training=is_training)
        return x + y


class ScanStageBlock(StageBlock):
    """StageBlock with a scan-compatible (carry, broadcast) signature."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, is_training=is_training), None


class Stage(nn.Module):
    """Conv token embedding, optional cls insertion, N stage blocks.

    ``scan_layers=True`` runs the blocks under ``nn.scan`` (parameters and
    BatchNorm statistics gain a leading layer axis) — CvT-W24's last stage
    is 20 blocks deep."""

    size: int
    num_heads: int
    embed_dim: int
    embed_kernel_size: int
    embed_strides: int
    sa_kernel_size: int = 3
    use_bias: bool = False
    activation_fn: Callable = nn.activation.gelu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    expand_ratio: float = 4
    insert_cls: bool = False
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    scan_layers: bool = False
    quantized: Union[bool, str] = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        x = ConvTokenEmbedBlock(out_ch=self.embed_dim,
                                kernel_size=self.embed_kernel_size,
                                strides=self.embed_strides,
                                dtype=self.dtype)(inputs,
                                                  is_training=is_training)

        if self.insert_cls:
            batch = x.shape[0]
            cls_token = self.param('cls', nn.initializers.zeros,
                                   (1, 1, self.embed_dim))
            x = jnp.concatenate([jnp.tile(cls_token, [batch, 1, 1]), x],
                                axis=1)

        block_kwargs = dict(num_heads=self.num_heads,
                            embed_dim=self.embed_dim,
                            kernel_size=self.sa_kernel_size,
                            use_bias=self.use_bias,
                            activation_fn=self.activation_fn,
                            bn_momentum=self.bn_momentum,
                            bn_epsilon=self.bn_epsilon,
                            expand_ratio=self.expand_ratio,
                            dtype=self.dtype,
                            use_kernel=self.use_kernel,
                            quantized=self.quantized)
        if self.scan_layers and self.size > 2:
            # the first block can change sequence length (cls insertion
            # makes L one past a square; zero_pad_and_reshape then grows it
            # to the next square) — peel it so the scan carry is stable
            x = StageBlock(name='StageBlock_0', **block_kwargs)(
                x, is_training=is_training)
            scanned = nn.scan(ScanStageBlock,
                              variable_axes={'params': 0, 'batch_stats': 0},
                              split_rngs={'params': True, 'dropout': True},
                              in_axes=nn.broadcast,
                              length=self.size - 1)
            x, _ = scanned(name='StageBlock', **block_kwargs)(x, is_training)
            return x
        for _ in range(self.size):
            x = StageBlock(**block_kwargs)(x, is_training=is_training)
        return x


class CvT(nn.Module):
    """CvT classifier over NHWC images."""

    num_classes: int
    stage_sizes: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    embed_dim: Tuple[int, ...]
    embed_kernel_size: Tuple[int, ...] = (7, 3, 3)
    embed_strides: Tuple[int, ...] = (4, 2, 2)
    sa_kernel_size: Tuple[int, ...] = (3, 3, 3)
    use_bias: bool = False
    expand_ratio: float = 4
    activation_fn: Callable = nn.activation.gelu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    scan_layers: bool = False
    quantized: Union[bool, str] = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        if self.quantized and self.quantized not in ('ff', 'all'):
            raise ValueError(
                f'CvT quantized={self.quantized!r} is not supported: only '
                "'ff'/'all' (int8 FF on >=256-ch stages; narrower stages "
                'measured a loss at every granularity — '
                'docs/PERFORMANCE.md round-4).')
        x = inputs
        for i in range(len(self.stage_sizes) - 1):
            x = Stage(size=self.stage_sizes[i],
                      num_heads=self.num_heads[i],
                      embed_dim=self.embed_dim[i],
                      embed_kernel_size=self.embed_kernel_size[i],
                      embed_strides=self.embed_strides[i],
                      sa_kernel_size=self.sa_kernel_size[i],
                      use_bias=self.use_bias,
                      activation_fn=self.activation_fn,
                      bn_momentum=self.bn_momentum,
                      bn_epsilon=self.bn_epsilon,
                      expand_ratio=self.expand_ratio,
                      dtype=self.dtype,
                      use_kernel=self.use_kernel,
                      scan_layers=self.scan_layers,
                      quantized=self.quantized)(x, is_training=is_training)

            side = math.isqrt(x.shape[1])
            x = rearrange(x, 'b (H W) c -> b H W c', H=side)

        x = Stage(size=self.stage_sizes[-1],
                  num_heads=self.num_heads[-1],
                  embed_dim=self.embed_dim[-1],
                  embed_kernel_size=self.embed_kernel_size[-1],
                  embed_strides=self.embed_strides[-1],
                  sa_kernel_size=self.sa_kernel_size[-1],
                  use_bias=self.use_bias,
                  activation_fn=self.activation_fn,
                  bn_momentum=self.bn_momentum,
                  bn_epsilon=self.bn_epsilon,
                  expand_ratio=self.expand_ratio,
                  insert_cls=True,
                  dtype=self.dtype,
                  use_kernel=self.use_kernel,
                  scan_layers=self.scan_layers,
                  quantized=self.quantized)(x, is_training=is_training)

        return nn.Dense(features=self.num_classes,
                        use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.zeros)(x[:, 0])
