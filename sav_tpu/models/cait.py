"""CaiT: Class-Attention in Image Transformers (Touvron et al., 2021).

Checkpoint- and API-compatible with the reference (models/cait.py:10-183):
a self-attention body with talking heads + LayerScale + stochastic depth,
followed by class-attention blocks where only the cls token is updated.

Note: the reference constructs its body ``Encoder`` without forwarding
``dtype`` (models/cait.py:150-158), silently running the body in float32 even
for bf16 models; we forward dtype so bf16 actually reaches the hot path.
In float32 the two are identical, which is what the golden-logit harness
checks.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from sav_tpu.nn import (AddAbsPosEmbed, AttentionBlock, FFBlock,
                        LayerScaleBlock, PatchEmbedBlock, SelfAttentionBlock,
                        StochasticDepthBlock)


class ClassSelfAttentionBlock(AttentionBlock):
    """Attention where only the first (cls) token forms the query."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        inputs_q = inputs[:, :1, :]
        return super().__call__(inputs_q, inputs, is_training=is_training)


class EncoderBlock(nn.Module):
    """CaiT body block: talking-heads SA and MLP, each behind
    LayerScale + stochastic depth."""

    num_heads: int
    stoch_depth_rate: float
    layerscale_eps: float
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    quantized: Union[bool, str] = False

    def _th_fused_route(self, inputs) -> bool:
        """Route LN+talking-heads-SA through the one-boundary fused span
        (ops.th_attention) on TPU when shapes fit — the XLA path pays ~2x
        per sublayer for the two head mixes (benchmarks/cait_th_probe.py:
        5.872 vs 3.176 ms/layer at CaiT-S24 shapes; fused span 3.794)
        because the [B,H,L,L] logits round-trip HBM around each mix.
        End to end: cait_s_24 @224 bs128 598 -> 1098 img/s (1.95x the
        reference's matched compute, docs/PERFORMANCE.md round 3)."""
        if self.use_kernel == 'fused_th':
            assert not (self.attn_dropout_rate or self.dropout_rate), \
                'fused_th path is dropout-free'
            return True
        if self.use_kernel != 'auto':
            return False
        if self.attn_dropout_rate or self.dropout_rate:
            return False
        from sav_tpu.ops import th_attention
        import jax
        if jax.default_backend() != 'tpu':
            return False       # CPU interpret mode would be a slowdown
        dim = inputs.shape[-1]
        return th_attention.th_mode(inputs.shape[-2], self.num_heads,
                                    dim // self.num_heads) is not None

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        if self._th_fused_route(inputs):
            from sav_tpu.nn.attention import (AttentionSublayerParams,
                                              LayerNormParams)
            from sav_tpu.ops import th_attention
            dim = inputs.shape[-1]
            s1, b1 = LayerNormParams(dim, name='LayerNorm_0')()
            wq, wk, wv, wo, m_pre, m_post = AttentionSublayerParams(
                in_ch=dim, num_heads=self.num_heads,
                head_ch=dim // self.num_heads, talking_heads=True,
                name='SelfAttentionBlock_0')()
            # residual=False: LayerScale + stochastic depth sit between
            # the sublayer and the skip connection (reference cait.py:
            # 18-53), so they stay outside the boundary
            sublayer = (th_attention.th_attention_sublayer_q8
                        if self.quantized == 'all'
                        else th_attention.th_attention_sublayer)
            x = sublayer(
                inputs.astype(self.dtype), s1, b1, wq, wk, wv, wo,
                m_pre, m_post, self.num_heads)
        else:
            x = nn.LayerNorm(dtype=self.dtype)(inputs)
            x = SelfAttentionBlock(num_heads=self.num_heads,
                                   talking_heads=True,
                                   attn_dropout_rate=self.attn_dropout_rate,
                                   out_dropout_rate=self.dropout_rate,
                                   dtype=self.dtype,
                                   use_kernel=self.use_kernel)(
                                       x, is_training=is_training)
        x = LayerScaleBlock(eps=self.layerscale_eps,
                            dtype=self.dtype)(x, is_training=is_training)
        x = StochasticDepthBlock(drop_rate=self.stoch_depth_rate)(
            x, is_training=is_training)
        x = x + inputs

        # explicit name: the fused branch consumes 'LayerNorm_0' via a
        # param holder, which would otherwise collide with auto-numbering
        y = nn.LayerNorm(dtype=self.dtype, name='LayerNorm_1')(x)
        y = FFBlock(expand_ratio=self.expand_ratio,
                    dropout_rate=self.dropout_rate,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype,
                    # 'all' runs the bare int8 FF kernel (CaiT's
                    # LayerScale sits between FF and residual, so the
                    # LN-fused residual-riding span does not apply)
                    quantized='ff' if self.quantized == 'all'
                    else self.quantized)(y, is_training=is_training)
        y = LayerScaleBlock(eps=self.layerscale_eps,
                            dtype=self.dtype)(y, is_training=is_training)
        y = StochasticDepthBlock(drop_rate=self.stoch_depth_rate)(
            y, is_training=is_training)
        return x + y


class ScanEncoderBlock(EncoderBlock):
    """EncoderBlock with a scan-compatible (carry, broadcast) signature."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, is_training=is_training), None


class Encoder(nn.Module):
    """Absolute position embedding + N CaiT body blocks (no final LN).

    ``scan_layers=True`` runs the body under ``nn.scan`` — CaiT goes up to
    48 layers, where depth-independent compile time matters most. Convert
    reference checkpoints with ``sav_tpu.utils.stacking``.
    """

    num_layers: int
    num_heads: int
    stoch_depth_rate: float
    layerscale_eps: float
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    quantized: Union[bool, str] = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        x = AddAbsPosEmbed()(inputs)
        x = nn.Dropout(rate=self.dropout_rate)(x,
                                               deterministic=not is_training)
        block_kwargs = dict(num_heads=self.num_heads,
                            expand_ratio=self.expand_ratio,
                            attn_dropout_rate=self.attn_dropout_rate,
                            dropout_rate=self.dropout_rate,
                            stoch_depth_rate=self.stoch_depth_rate,
                            layerscale_eps=self.layerscale_eps,
                            activation_fn=self.activation_fn,
                            dtype=self.dtype,
                            use_kernel=self.use_kernel,
                            quantized=self.quantized)
        if self.scan_layers:
            scanned = nn.scan(ScanEncoderBlock,
                              variable_axes={'params': 0},
                              split_rngs={'params': True, 'dropout': True,
                                          'stochastic_depth': True},
                              in_axes=nn.broadcast,
                              length=self.num_layers)
            x, _ = scanned(name='EncoderBlock', **block_kwargs)(
                x, is_training)
        else:
            for _ in range(self.num_layers):
                x = EncoderBlock(**block_kwargs)(x, is_training=is_training)
        return x


class CAEncoderBlock(nn.Module):
    """Class-attention block: the cls query attends over [cls; patches] and
    only the cls token is updated (patches stay frozen)."""

    num_heads: int
    stoch_depth_rate: float
    layerscale_eps: float
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'

    @nn.compact
    def __call__(self, inputs, cls_token, is_training: bool):
        x = jnp.concatenate([cls_token, inputs], axis=1)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = ClassSelfAttentionBlock(num_heads=self.num_heads,
                                    attn_dropout_rate=self.attn_dropout_rate,
                                    out_dropout_rate=self.dropout_rate,
                                    dtype=self.dtype,
                                    use_kernel=self.use_kernel)(
                                        x, is_training=is_training)
        x = LayerScaleBlock(eps=self.layerscale_eps,
                            dtype=self.dtype)(x, is_training=is_training)
        x = StochasticDepthBlock(drop_rate=self.stoch_depth_rate)(
            x, is_training=is_training)
        cls_token = cls_token + x

        y = nn.LayerNorm(dtype=self.dtype)(cls_token)
        y = FFBlock(expand_ratio=self.expand_ratio,
                    dropout_rate=self.dropout_rate,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype)(y, is_training=is_training)
        y = LayerScaleBlock(eps=self.layerscale_eps,
                            dtype=self.dtype)(y, is_training=is_training)
        y = StochasticDepthBlock(drop_rate=self.stoch_depth_rate)(
            y, is_training=is_training)
        return cls_token + y


class CaiT(nn.Module):
    """CaiT classifier: SA body, then class-attention layers for the head."""

    num_classes: int
    num_layers: int
    num_layers_token_only: int
    num_heads: int
    embed_dim: int
    patch_shape: Tuple[int, int]
    stoch_depth_rate: float
    layerscale_eps: float
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    quantized: Union[bool, str] = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        x = PatchEmbedBlock(patch_shape=self.patch_shape,
                            embed_dim=self.embed_dim,
                            dtype=self.dtype)(inputs)

        x = Encoder(num_layers=self.num_layers,
                    num_heads=self.num_heads,
                    expand_ratio=self.expand_ratio,
                    attn_dropout_rate=self.attn_dropout_rate,
                    dropout_rate=self.dropout_rate,
                    stoch_depth_rate=self.stoch_depth_rate,
                    layerscale_eps=self.layerscale_eps,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype,
                    use_kernel=self.use_kernel,
                    quantized=self.quantized,
                    scan_layers=self.scan_layers)(x, is_training=is_training)

        batch = x.shape[0]
        cls_token = self.param('cls', nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        cls_token = jnp.tile(cls_token, [batch, 1, 1])

        for _ in range(self.num_layers_token_only):
            cls_token = CAEncoderBlock(
                num_heads=self.num_heads,
                expand_ratio=self.expand_ratio,
                attn_dropout_rate=self.attn_dropout_rate,
                dropout_rate=self.dropout_rate,
                stoch_depth_rate=self.stoch_depth_rate,
                layerscale_eps=self.layerscale_eps,
                activation_fn=self.activation_fn,
                dtype=self.dtype,
                use_kernel=self.use_kernel)(x, cls_token,
                                            is_training=is_training)

        x = jnp.concatenate([cls_token, x], axis=1)
        x = nn.LayerNorm(dtype=self.dtype)(x)

        return nn.Dense(features=self.num_classes,
                        use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.zeros)(x[:, 0])
