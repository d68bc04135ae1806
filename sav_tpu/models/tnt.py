"""TNT: Transformer in Transformer (Han et al., 2021).

Checkpoint- and API-compatible with the reference (models/tnt.py:10-182):
an inner transformer over per-patch pixel tokens feeding an outer transformer
over patch tokens through a fold-and-project bridge.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from sav_tpu.nn import (AddAbsPosEmbed, FFBlock, PatchEmbedBlock,
                        SelfAttentionBlock)


class PixelEmbedBlock(nn.Module):
    """Embeds each patch as a sequence of transformed-pixel tokens.

    Output is ``[(B * num_patches), inner_len, embed_dim]`` where
    ``inner_len = (ph/t1) * (pw/t2)`` (reference: models/tnt.py:10-33).
    """

    patch_shape: Tuple[int, int]
    transformed_patch_shape: Tuple[int, int]
    embed_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        ph, pw = self.patch_shape
        t1, t2 = self.transformed_patch_shape
        assert ph % t1 == 0 and pw % t2 == 0

        x = rearrange(inputs, 'b (h ph) (w pw) c -> (b h w) ph pw c',
                      ph=ph, pw=pw)
        x = rearrange(x, 'n (p1 t1) (p2 t2) c -> n (p1 p2) (c t1 t2)',
                      t1=t1, t2=t2)
        return nn.Dense(self.embed_dim,
                        use_bias=self.use_bias,
                        dtype=self.dtype)(x)


class Inner2OuterBlock(nn.Module):
    """Folds pixel tokens flat, projects to the outer width and adds them to
    the patch embeddings (cls row receives zeros via the shift pad)."""

    out_ch: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patch_inputs, pixel_inputs):
        batch = patch_inputs.shape[0]
        out_ch = self.out_ch or patch_inputs.shape[-1]

        x = rearrange(pixel_inputs, '... n d -> ... (n d)')
        x = nn.Dense(features=out_ch, dtype=self.dtype)(x)
        x = rearrange(x, '(b l) d -> b l d', b=batch)
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
        return x + patch_inputs


class EncoderBlock(nn.Module):
    """One TNT layer: inner transformer block, bridge, outer block."""

    inner_num_heads: int
    outer_num_heads: int
    inner_expand_ratio: float = 4
    outer_expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'

    def _inner_fused_route(self, pixel_inputs) -> bool:
        """Route the whole inner layer through the patches-in-lanes
        Pallas kernel (ops.tnt_inner): the standard path's [B*P, 16, 24]
        tensors pad 16/24 -> 128 lanes on TPU, an 8x bandwidth tax that
        makes the inner stack ~9 ms/layer for <1 GFLOP; the kernel
        measures 1.13 ms/layer fwd (benchmarks/tnt_inner_kernel_proto.py,
        full receipts docs/PERFORMANCE.md round-3)."""
        if self.use_kernel in ('fused_inner', 'fused_inner_outer'):
            assert not (self.attn_dropout_rate or self.dropout_rate), \
                'fused_inner path is dropout-free'
            return True
        if self.use_kernel != 'auto':
            return False
        if self.attn_dropout_rate or self.dropout_rate:
            return False
        import jax as _jax
        from sav_tpu.ops import tnt_inner
        if _jax.default_backend() != 'tpu':
            return False       # CPU interpret mode would be a slowdown
        l, d = pixel_inputs.shape[-2], pixel_inputs.shape[-1]
        return tnt_inner.supported(l, d, self.inner_num_heads)

    @nn.compact
    def __call__(self, patch_inputs, pixel_inputs, is_training: bool):
        if self._inner_fused_route(pixel_inputs):
            from sav_tpu.nn.attention import (AttentionSublayerParams,
                                              LayerNormParams)
            from sav_tpu.nn.feedforward import FFParams
            from sav_tpu.ops import tnt_inner
            d = pixel_inputs.shape[-1]
            s1, b1 = LayerNormParams(d, name='LayerNorm_0')()
            wq, wk, wv, wo = AttentionSublayerParams(
                in_ch=d, num_heads=self.inner_num_heads,
                head_ch=d // self.inner_num_heads,
                name='SelfAttentionBlock_0')()
            s2, b2 = LayerNormParams(d, name='LayerNorm_1')()
            hidden = max(1, int(self.inner_expand_ratio * d))
            w1, bb1, w2, bb2 = FFParams(d, hidden, name='FFBlock_0')()
            inner_output = tnt_inner.inner_layer(
                pixel_inputs.astype(self.dtype), s1, b1, wq, wk, wv, wo,
                s2, b2, w1, bb1, w2, bb2, self.inner_num_heads)
        else:
            inner_x = nn.LayerNorm(dtype=self.dtype,
                                   name='LayerNorm_0')(pixel_inputs)
            inner_x = SelfAttentionBlock(
                num_heads=self.inner_num_heads,
                attn_dropout_rate=self.attn_dropout_rate,
                out_dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                use_kernel=self.use_kernel,
                name='SelfAttentionBlock_0')(
                    inner_x, is_training=is_training)
            inner_x = inner_x + pixel_inputs
            inner_y = nn.LayerNorm(dtype=self.dtype,
                                   name='LayerNorm_1')(inner_x)
            inner_y = FFBlock(expand_ratio=self.inner_expand_ratio,
                              dropout_rate=self.dropout_rate,
                              dtype=self.dtype,
                              name='FFBlock_0')(inner_y,
                                                is_training=is_training)
            inner_output = inner_x + inner_y

        bridged = Inner2OuterBlock(dtype=self.dtype)(patch_inputs,
                                                     inner_output)

        # outer attention sublayer: on TPU the whole LN->qkv->core->out-proj
        # span runs under one custom_vjp boundary (ops.fused_layer,
        # residual=False because TNT's skip adds the PRE-bridge patch
        # embeddings, reference tnt.py:77-85); parameter tree unchanged.
        # Auto-routing is ROW-COUNT gated: at bs64 @224 (12.6k rows) the
        # fused span measured a 2.1% loss (r3, 40.79 vs 39.94 ms/step),
        # but at bs128/bs192 it WINS +20.7%/+10.1% (r4,
        # benchmarks/tnt_outer_fused_probe.py: 1289.4 -> 1555.8 and
        # 1347.6 -> 1483.1 img/s) — the boundary tax amortizes once the
        # span has enough rows, the ViT-B mechanism.
        from sav_tpu.models.vit import FUSED_LAYER_MODES
        fused_core = FUSED_LAYER_MODES.get(self.use_kernel)
        if self.use_kernel == 'fused_inner_outer':
            fused_core = 'fused'   # inner kernel + fused outer sublayer
        if (fused_core is None and self.use_kernel == 'auto'
                and not (self.attn_dropout_rate or self.dropout_rate)):
            import jax as _jax
            rows = bridged.shape[0] * bridged.shape[-2]
            if _jax.default_backend() == 'tpu' and rows >= 20000:
                fused_core = 'fused'
        if fused_core is not None:
            from sav_tpu.nn.attention import (AttentionSublayerParams,
                                              LayerNormParams)
            from sav_tpu.ops import fused_layer
            dim = bridged.shape[-1]
            ln_scale, ln_bias = LayerNormParams(dim, name='LayerNorm_2')()
            wq, wk, wv, wo = AttentionSublayerParams(
                in_ch=dim, num_heads=self.outer_num_heads,
                head_ch=dim // self.outer_num_heads,
                name='SelfAttentionBlock_1')()
            if (fused_core == 'fused' and not fused_layer.fused_supported(
                    bridged.shape[-2], self.outer_num_heads,
                    dim // self.outer_num_heads)):
                fused_core = 'flash'
            outer_x = patch_inputs + fused_layer.attention_sublayer(
                bridged.astype(self.dtype), ln_scale, ln_bias,
                wq, wk, wv, wo, self.outer_num_heads, fused_core,
                fused_layer.LN_EPS, False)
        else:
            outer_x = nn.LayerNorm(dtype=self.dtype,
                                   name='LayerNorm_2')(bridged)
            outer_x = SelfAttentionBlock(
                num_heads=self.outer_num_heads,
                attn_dropout_rate=self.attn_dropout_rate,
                out_dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                use_kernel=self.use_kernel,
                name='SelfAttentionBlock_1')(
                    outer_x, is_training=is_training)
            outer_x = outer_x + patch_inputs
        outer_y = nn.LayerNorm(dtype=self.dtype,
                               name='LayerNorm_3')(outer_x)
        # explicit name: the fused-inner branch consumes 'FFBlock_0' via
        # a param holder, which would otherwise shift auto-numbering
        outer_y = FFBlock(expand_ratio=self.outer_expand_ratio,
                          dropout_rate=self.dropout_rate,
                          dtype=self.dtype,
                          name='FFBlock_1')(outer_y,
                                            is_training=is_training)
        return outer_x + outer_y, inner_output


class ScanEncoderBlock(EncoderBlock):
    """EncoderBlock threading the (patch, pixel) pair as the scan carry."""

    @nn.compact
    def __call__(self, carry, is_training: bool):
        patch, pixel = carry
        patch, pixel = super().__call__(patch, pixel,
                                        is_training=is_training)
        return (patch, pixel), None


class Encoder(nn.Module):
    """N TNT layers threading (patch, pixel) state; returns patch tokens."""

    num_layers: int
    inner_num_heads: int
    outer_num_heads: int
    inner_expand_ratio: float = 4
    outer_expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    scan_layers: bool = False

    @nn.compact
    def __call__(self, patch_embeddings, pixel_embeddings, is_training: bool):
        block_kwargs = dict(
            inner_num_heads=self.inner_num_heads,
            outer_num_heads=self.outer_num_heads,
            attn_dropout_rate=self.attn_dropout_rate,
            dropout_rate=self.dropout_rate,
            activation_fn=self.activation_fn,
            dtype=self.dtype,
            use_kernel=self.use_kernel)
        if self.scan_layers:
            scanned = nn.scan(ScanEncoderBlock,
                              variable_axes={'params': 0},
                              split_rngs={'params': True, 'dropout': True},
                              in_axes=nn.broadcast,
                              length=self.num_layers)
            (patch_embeddings, _), _ = scanned(
                name='EncoderBlock', **block_kwargs)(
                    (patch_embeddings, pixel_embeddings), is_training)
            return patch_embeddings
        for _ in range(self.num_layers):
            patch_embeddings, pixel_embeddings = EncoderBlock(
                **block_kwargs)(patch_embeddings,
                                pixel_embeddings,
                                is_training=is_training)
        return patch_embeddings


class TNT(nn.Module):
    """TNT classifier over NHWC images."""

    num_classes: int
    num_layers: int
    inner_num_heads: int
    outer_num_heads: int
    inner_embed_dim: int
    outer_embed_dim: int
    patch_shape: Tuple[int, int] = (16, 16)
    transformed_patch_shape: Tuple[int, int] = (4, 4)
    inner_expand_ratio: float = 4
    outer_expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    scan_layers: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        pixel_embeddings = PixelEmbedBlock(
            patch_shape=self.patch_shape,
            transformed_patch_shape=self.transformed_patch_shape,
            embed_dim=self.inner_embed_dim,
            dtype=self.dtype)(inputs)

        patch_embeddings = PatchEmbedBlock(patch_shape=self.patch_shape,
                                           embed_dim=self.outer_embed_dim,
                                           use_bias=True,
                                           dtype=self.dtype)(inputs)

        batch = patch_embeddings.shape[0]
        cls_token = self.param('cls', nn.initializers.zeros,
                               (1, 1, self.outer_embed_dim))
        patch_embeddings = jnp.concatenate(
            [jnp.tile(cls_token, [batch, 1, 1]), patch_embeddings], axis=1)

        pixel_embeddings = AddAbsPosEmbed()(pixel_embeddings)
        patch_embeddings = AddAbsPosEmbed()(patch_embeddings)

        patch_embeddings = nn.Dropout(rate=self.dropout_rate)(
            patch_embeddings, deterministic=not is_training)

        patch_embeddings = Encoder(num_layers=self.num_layers,
                                   inner_num_heads=self.inner_num_heads,
                                   outer_num_heads=self.outer_num_heads,
                                   attn_dropout_rate=self.attn_dropout_rate,
                                   dropout_rate=self.dropout_rate,
                                   activation_fn=self.activation_fn,
                                   dtype=self.dtype,
                                   use_kernel=self.use_kernel,
                                   scan_layers=self.scan_layers)(
                                       patch_embeddings,
                                       pixel_embeddings,
                                       is_training=is_training)

        return nn.Dense(features=self.num_classes,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.zeros)(
                            patch_embeddings[:, 0])
