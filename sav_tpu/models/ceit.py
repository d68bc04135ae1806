"""CeiT: Convolution-enhanced image Transformer (Yuan et al., 2021).

Checkpoint- and API-compatible with the reference (models/ceit.py:11-156):
conv I2T stem, post-LN encoder blocks with LeFF conv-FFNs that collect the
cls token after every layer, and a final layer-wise class attention (LCA)
over the stack of per-layer cls tokens.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from sav_tpu.nn import (AttentionBlock, FFBlock, Image2TokenBlock, LeFFBlock,
                        SelfAttentionBlock)


class LCSelfAttentionBlock(AttentionBlock):
    """Attention where only the last token forms the query (LCA)."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        inputs_q = inputs[:, -1:, :]
        return super().__call__(inputs_q, inputs, is_training=is_training)


class EncoderBlock(nn.Module):
    """Post-LN block: SA -> LN, LeFF -> LN (reference: models/ceit.py:19-44)."""

    num_heads: int
    expand_ratio: float = 4
    leff_kernel_size: Optional[int] = 3
    activation_fn: Callable = nn.activation.gelu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        # One-boundary fused span for the POST-LN sublayer: x + W_o@MHA(x)
        # (no LN inside — CeiT normalizes after the residual). Explicit
        # 'fused_layer*' modes; auto routing is decided by measurement
        # (docs/PERFORMANCE.md round-3 section).
        from sav_tpu.models.vit import FUSED_LAYER_MODES

        fused_core = FUSED_LAYER_MODES.get(self.use_kernel)
        if fused_core is not None:
            x = self._fused_attention_sublayer(inputs, fused_core)
        else:
            x = SelfAttentionBlock(num_heads=self.num_heads,
                                   dtype=self.dtype,
                                   use_kernel=self.use_kernel)(
                                       inputs, is_training=is_training)
            x = x + inputs
        x = nn.LayerNorm(dtype=self.dtype)(x)

        y = LeFFBlock(expand_ratio=self.expand_ratio,
                      kernel_size=self.leff_kernel_size,
                      activation_fn=self.activation_fn,
                      bn_momentum=self.bn_momentum,
                      bn_epsilon=self.bn_epsilon,
                      dtype=self.dtype)(x, is_training=is_training)
        y = x + y
        return nn.LayerNorm(dtype=self.dtype)(y)

    def _fused_attention_sublayer(self, inputs, core: str):
        """``x + W_o @ MHA(x)`` as ONE custom_vjp span
        (ops.fused_layer.attention_sublayer_noln); parameter tree identical
        to the standard path (SelfAttentionBlock_0), so the two are
        checkpoint-interchangeable."""
        from sav_tpu.nn.attention import AttentionSublayerParams
        from sav_tpu.ops import fused_layer

        dim = inputs.shape[-1]
        wq, wk, wv, wo = AttentionSublayerParams(
            in_ch=dim, num_heads=self.num_heads,
            head_ch=dim // self.num_heads,
            name='SelfAttentionBlock_0')()
        if (core == 'fused' and not fused_layer.fused_supported(
                inputs.shape[-2], self.num_heads, dim // self.num_heads)):
            core = 'flash'
        return fused_layer.attention_sublayer_noln(
            inputs.astype(self.dtype), wq, wk, wv, wo, self.num_heads,
            core, True)


class ScanEncoderBlock(EncoderBlock):
    """EncoderBlock emitting its cls token as the scan output."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        x = super().__call__(inputs, is_training=is_training)
        return x, x[:, :1]


class Encoder(nn.Module):
    """N post-LN blocks; returns the per-layer cls tokens ``[B, N, D]``.

    ``scan_layers=True`` runs the blocks under ``nn.scan`` (BatchNorm
    statistics gain a leading layer axis alongside the parameters)."""

    num_layers: int
    num_heads: int
    expand_ratio: float = 4
    leff_kernel_size: int = 3
    activation_fn: Callable = nn.activation.gelu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    scan_layers: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        block_kwargs = dict(
            num_heads=self.num_heads,
            expand_ratio=self.expand_ratio,
            leff_kernel_size=self.leff_kernel_size,
            activation_fn=self.activation_fn,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            use_kernel=self.use_kernel,
        )
        if self.scan_layers:
            scanned = nn.scan(ScanEncoderBlock,
                              variable_axes={'params': 0, 'batch_stats': 0},
                              split_rngs={'params': True, 'dropout': True},
                              in_axes=nn.broadcast,
                              length=self.num_layers)
            _, cls_tokens = scanned(name='EncoderBlock', **block_kwargs)(
                inputs, is_training)
            # [layers, B, 1, D] -> [B, layers, D]
            return jnp.swapaxes(cls_tokens[:, :, 0, :], 0, 1)

        x = inputs
        cls_tokens = []
        for _ in range(self.num_layers):
            x = EncoderBlock(**block_kwargs)(x, is_training=is_training)
            cls_tokens.append(x[:, :1])
        return jnp.concatenate(cls_tokens, axis=1)


class LCAEncoderBlock(nn.Module):
    """Layer-wise class-attention block (defined for completeness; the model
    applies a bare ``LCSelfAttentionBlock`` like the reference does —
    models/ceit.py:147-151 — so its LCAEncoderBlock is likewise unused)."""

    num_heads: int
    expand_ratio: float = 4
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        x = LCSelfAttentionBlock(num_heads=self.num_heads,
                                 dtype=self.dtype,
                                 use_kernel=self.use_kernel)(
                                     inputs, is_training=is_training)
        x = x + inputs
        x = nn.LayerNorm(dtype=self.dtype)(x)

        y = FFBlock(expand_ratio=self.expand_ratio,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype)(x, is_training=is_training)
        y = x + y
        return nn.LayerNorm(dtype=self.dtype)(y)


class CeiT(nn.Module):
    """CeiT classifier over NHWC images."""

    num_classes: int
    num_layers: int
    num_heads: int
    embed_dim: int
    patch_shape: Tuple[int, int] = (4, 4)
    num_ch: int = 32
    conv_kernel_size: int = 7
    conv_stride: int = 2
    pool_window_size: int = 3
    pool_stride: int = 2
    expand_ratio: float = 4
    leff_kernel_size: int = 3
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    scan_layers: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        assert self.embed_dim % self.num_heads == 0

        x = Image2TokenBlock(patch_shape=self.patch_shape,
                             num_ch=self.num_ch,
                             conv_kernel_size=self.conv_kernel_size,
                             conv_stride=self.conv_stride,
                             pool_window_size=self.pool_window_size,
                             pool_stride=self.pool_stride,
                             embed_dim=self.embed_dim,
                             bn_momentum=self.bn_momentum,
                             bn_epsilon=self.bn_epsilon,
                             dtype=self.dtype)(inputs, is_training=is_training)

        batch = x.shape[0]
        cls_token = self.param('cls', nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.tile(cls_token, [batch, 1, 1]), x], axis=1)

        cls_tokens = Encoder(num_layers=self.num_layers,
                             num_heads=self.num_heads,
                             expand_ratio=self.expand_ratio,
                             leff_kernel_size=self.leff_kernel_size,
                             bn_momentum=self.bn_momentum,
                             bn_epsilon=self.bn_epsilon,
                             dtype=self.dtype,
                             use_kernel=self.use_kernel,
                             scan_layers=self.scan_layers)(
                                 x, is_training=is_training)

        cls_tokens = LCSelfAttentionBlock(num_heads=self.num_heads,
                                          dtype=self.dtype,
                                          use_kernel=self.use_kernel)(
                                              cls_tokens,
                                              is_training=is_training)

        return nn.Dense(features=self.num_classes,
                        use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.zeros)(cls_tokens[:, -1])
