"""ViT: Vision Transformer (Dosovitskiy et al., 2020).

Checkpoint- and API-compatible with the reference implementation
(reference: models/vit.py:9-99): pre-LN encoder blocks, learned absolute
position embedding, zero-initialized cls token and classifier head.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from sav_tpu.nn import (AddAbsPosEmbed, FFBlock, FixedPositionalEmbedding,
                        PatchEmbedBlock, SelfAttentionBlock)


# use_kernel values that route the whole attention sublayer through ONE
# custom_vjp boundary (ops.fused_layer) instead of per-op dispatch; the
# value picks the core implementation inside the boundary.
FUSED_LAYER_MODES = {
    'fused_layer': 'flash',         # Pallas flash core, XLA projections
    'fused_layer_xla': 'xla',       # everything XLA (boundary-cost probe)
    'fused_layer_full': 'fused',    # one Pallas kernel for the whole span
}

# use_kernel values that put the WHOLE encoder layer (attention + FF
# sublayers) behind one custom_vjp (ops.fused_layer.encoder_layer):
# half the boundaries of FUSED_LAYER_MODES, and the [B, L, 4D] pre-gelu
# FF residual is recomputed instead of stored.
FUSED_BLOCK_MODES = {
    'fused_block': 'flash',
    'fused_block_full': 'fused',
}


class EncoderBlock(nn.Module):
    """Pre-LN transformer block: LN->MHA->residual, LN->MLP->residual."""

    num_heads: int
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    fused_qkv: bool = False
    quantized: bool = False
    rotary: bool = False
    # q/k/v/out projection biases (reference default: none, attention.py
    # use_bias=False). Enabled by the HF-checkpoint importer
    # (sav_tpu/utils/hf_import.py) whose source trees carry them.
    attn_bias: bool = False

    def _auto_fused_core(self, inputs) -> Union[str, None]:
        """Auto dispatch: route the attention sublayer through the
        one-boundary fused path on TPU when eligible.

        Measured end-to-end (ViT-B/16 @224 bs=192 bf16, v5e, round 3):
        per-op auto dispatch 193.5 ms/step vs 160.9 ms with the fused
        sublayer ('fused' core) and 166.0 ms with the 'flash' core — the
        per-op custom_vjp boundary tax that sank every earlier kernel
        integration disappears when the boundary sits at the layer edge.
        Receipts: docs/PERFORMANCE.md round-3 section.
        """
        from sav_tpu.ops import fused_layer

        if (self.attn_dropout_rate or self.dropout_rate or self.fused_qkv
                or self.attn_bias):
            return None
        return fused_layer.auto_core(inputs.shape[-2], self.num_heads,
                                     inputs.shape[-1] // self.num_heads)

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        block_core = FUSED_BLOCK_MODES.get(self.use_kernel)
        if block_core is not None:
            return self._fused_encoder_layer(inputs, block_core)
        fused_core = FUSED_LAYER_MODES.get(self.use_kernel)
        if fused_core is None and self.use_kernel == 'auto':
            fused_core = self._auto_fused_core(inputs)
        if fused_core is not None:
            x = self._fused_attention_sublayer(inputs, fused_core)
        else:
            x = nn.LayerNorm(dtype=self.dtype)(inputs)
            x = SelfAttentionBlock(num_heads=self.num_heads,
                                   attn_dropout_rate=self.attn_dropout_rate,
                                   out_dropout_rate=self.dropout_rate,
                                   dtype=self.dtype,
                                   use_kernel=self.use_kernel,
                                   fused_qkv=self.fused_qkv,
                                   use_bias=self.attn_bias,
                                   rotary=self.rotary)(
                                       x, is_training=is_training)
            x = x + inputs

        if (self.quantized in ('ff', 'ff_sb', 'all') and not self.dropout_rate
                and self.activation_fn is nn.activation.gelu):
            # one custom_vjp for LN -> int8 FF -> residual: the bare
            # int8 kernel under its own boundary measured a LOSS end to
            # end (LN_1 un-fused from W1); the sublayer span wins — see
            # sav_tpu/ops/int8_ff.py integration receipt. 'ff_sb' swaps
            # in the SwitchBack backward (dx GEMMs int8 in one kernel).
            from sav_tpu.ops import fused_layer, int8_ff
            s2, b2, w1, bb1, w2, bb2 = self._ff_sublayer_params(x)
            sublayer = (int8_ff.int8_ff_sublayer_sb
                        if self.quantized == 'ff_sb'
                        else int8_ff.int8_ff_sublayer)
            return sublayer(
                x.astype(self.dtype), s2, b2, w1, bb1, w2, bb2,
                fused_layer.LN_EPS)

        if self.use_kernel == 'fused_ff':
            # XLA forward + Pallas fused backward for the FF sublayer:
            # dh = (dy @ W2') * gelu'(hpre) never round-trips HBM.
            # OPT-IN ONLY — measured a 3.2 ms/layer LOSS vs XLA at ViT-B
            # @224 (benchmarks/ff_bwd_probe.py: 10.56 vs 7.39 ms/layer;
            # XLA is within ~10% of the pure-GEMM bound, no dh headroom);
            # kept as the equality-tested receipt, docs/PERFORMANCE.md.
            from sav_tpu.ops import fused_layer
            assert not self.dropout_rate and not self.quantized, \
                'fused_ff path is dropout-free and unquantized'
            assert self.activation_fn is nn.activation.gelu, \
                'fused_ff hardcodes the tanh-gelu derivative'
            assert fused_layer.ff_kernel_supported(
                x.shape[-1],
                max(1, int(self.expand_ratio * x.shape[-1]))), \
                'fused_ff geometry exceeds the VMEM ceiling'
            s2, b2, w1, bb1, w2, bb2 = self._ff_sublayer_params(x)
            return fused_layer.ff_sublayer(
                x.astype(self.dtype), s2, b2, w1, bb1, w2, bb2,
                fused_layer.LN_EPS)

        # explicit name: the fused branch consumes 'LayerNorm_0' via a
        # param holder, which would otherwise collide with auto-numbering
        y = nn.LayerNorm(dtype=self.dtype, name='LayerNorm_1')(x)
        y = FFBlock(expand_ratio=self.expand_ratio,
                    dropout_rate=self.dropout_rate,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype,
                    quantized=self.quantized)(y, is_training=is_training)
        return x + y

    def _ff_sublayer_params(self, x):
        """LN_1 + FFBlock_0 param holders matching the standard path's
        auto-numbered tree (checkpoint-interchangeable)."""
        from sav_tpu.nn.attention import LayerNormParams
        from sav_tpu.nn.feedforward import FFParams
        dim = x.shape[-1]
        s2, b2 = LayerNormParams(dim, name='LayerNorm_1')()
        hidden = max(1, int(self.expand_ratio * dim))
        w1, bb1, w2, bb2 = FFParams(dim, hidden, name='FFBlock_0')()
        return s2, b2, w1, bb1, w2, bb2

    def _fused_attention_sublayer(self, inputs, core: str):
        """LN -> self-attention -> out-proj -> residual as ONE custom_vjp
        span (ops.fused_layer); parameter tree identical to the standard
        path, so the two are checkpoint-interchangeable."""
        from sav_tpu.nn.attention import (AttentionSublayerParams,
                                          LayerNormParams)
        from sav_tpu.ops import fused_layer

        assert self.attn_dropout_rate == 0.0 and self.dropout_rate == 0.0, \
            'fused_layer path is dropout-free'
        assert not self.fused_qkv
        assert not self.attn_bias, 'fused_layer path carries no qkv biases'
        dim = inputs.shape[-1]
        scale, bias = LayerNormParams(dim, name='LayerNorm_0')()
        wq, wk, wv, wo = AttentionSublayerParams(
            in_ch=dim, num_heads=self.num_heads,
            head_ch=dim // self.num_heads,
            name='SelfAttentionBlock_0')()
        if self.quantized == 'all' and not self.rotary:
            # serving-only: int8 q/k/v/out projections inside the fused
            # forward (falls back to the bf16 'flash' span off-geometry)
            return fused_layer.attention_sublayer_q8(
                inputs.astype(self.dtype), scale, bias, wq, wk, wv, wo,
                self.num_heads, fused_layer.LN_EPS, True)
        if (core == 'fused' and not fused_layer.fused_supported(
                inputs.shape[-2], self.num_heads, dim // self.num_heads)):
            core = 'flash'
        return fused_layer.attention_sublayer(
            inputs.astype(self.dtype), scale, bias, wq, wk, wv, wo,
            self.num_heads, core, fused_layer.LN_EPS, True, self.rotary)

    def _fused_encoder_layer(self, inputs, core: str):
        """The whole layer (attention + FF) as ONE custom_vjp span;
        parameter tree identical to the standard path."""
        from sav_tpu.nn.attention import (AttentionSublayerParams,
                                          LayerNormParams)
        from sav_tpu.nn.feedforward import FFParams
        from sav_tpu.ops import fused_layer

        assert self.attn_dropout_rate == 0.0 and self.dropout_rate == 0.0, \
            'fused_block path is dropout-free'
        assert not self.rotary and not self.fused_qkv and not self.quantized
        assert not self.attn_bias, 'fused_block path carries no qkv biases'
        assert self.activation_fn is nn.activation.gelu, \
            'fused_block path is gelu-only'
        dim = inputs.shape[-1]
        s1, b1 = LayerNormParams(dim, name='LayerNorm_0')()
        wq, wk, wv, wo = AttentionSublayerParams(
            in_ch=dim, num_heads=self.num_heads,
            head_ch=dim // self.num_heads,
            name='SelfAttentionBlock_0')()
        s2, b2 = LayerNormParams(dim, name='LayerNorm_1')()
        hidden = max(1, int(self.expand_ratio * dim))
        w1, bb1, w2, bb2 = FFParams(dim, hidden, name='FFBlock_0')()
        if (core == 'fused' and not fused_layer.fused_supported(
                inputs.shape[-2], self.num_heads, dim // self.num_heads)):
            core = 'flash'
        return fused_layer.encoder_layer(
            inputs.astype(self.dtype), s1, b1, wq, wk, wv, wo, s2, b2,
            w1, bb1, w2, bb2, self.num_heads, core, fused_layer.LN_EPS)


class ScanEncoderBlock(EncoderBlock):
    """EncoderBlock with a scan-compatible (carry, broadcast) signature."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, is_training=is_training), None


class Encoder(nn.Module):
    """Position embedding + N encoder blocks + final LayerNorm.

    With ``scan_layers=True`` the blocks run under ``nn.scan``: compile time
    becomes depth-independent and parameters carry a leading layer axis
    (convert reference checkpoints with
    ``sav_tpu.utils.stacking.stack_layer_params``).
    """

    num_layers: int
    num_heads: int
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    fused_qkv: bool = False
    scan_layers: bool = False
    quantized: bool = False
    pos_embed: str = 'learned'
    attn_bias: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        # 'learned' is the reference default (AddAbsPosEmbed, models/vit.py:
        # 44-46); 'fixed' swaps in the parameter-free sinusoidal table;
        # 'rotary' drops the additive embedding and rotates q/k inside every
        # attention block instead (the reference's TODO, README.md:5).
        if self.pos_embed == 'learned':
            x = AddAbsPosEmbed()(inputs)
        elif self.pos_embed == 'fixed':
            x = FixedPositionalEmbedding(dtype=self.dtype)(inputs)
        elif self.pos_embed in ('rotary', 'none'):
            x = inputs
        else:
            raise ValueError(
                f'pos_embed must be learned|fixed|rotary|none, '
                f'got {self.pos_embed!r}')
        x = nn.Dropout(rate=self.dropout_rate)(x,
                                               deterministic=not is_training)
        block_kwargs = dict(num_heads=self.num_heads,
                            expand_ratio=self.expand_ratio,
                            attn_dropout_rate=self.attn_dropout_rate,
                            dropout_rate=self.dropout_rate,
                            activation_fn=self.activation_fn,
                            dtype=self.dtype,
                            use_kernel=self.use_kernel,
                            fused_qkv=self.fused_qkv,
                            quantized=self.quantized,
                            attn_bias=self.attn_bias,
                            rotary=self.pos_embed == 'rotary')
        if self.scan_layers:
            scanned = nn.scan(ScanEncoderBlock,
                              variable_axes={'params': 0},
                              split_rngs={'params': True, 'dropout': True},
                              in_axes=nn.broadcast,
                              length=self.num_layers)
            x, _ = scanned(name='EncoderBlock', **block_kwargs)(
                x, is_training)
        else:
            for _ in range(self.num_layers):
                x = EncoderBlock(**block_kwargs)(x, is_training=is_training)
        return nn.LayerNorm(dtype=self.dtype)(x)


class ViT(nn.Module):
    """Vision Transformer classifier over NHWC images."""

    num_classes: int
    num_layers: int
    num_heads: int
    embed_dim: int
    patch_shape: Tuple[int, int]
    expand_ratio: float = 4
    attn_dropout_rate: float = 0.0
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    fused_qkv: bool = False
    scan_layers: bool = False
    quantized: bool = False
    pos_embed: str = 'learned'      # learned | fixed | rotary | none
    attn_bias: bool = False         # q/k/v/out biases (HF-ViT trees)

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        assert self.embed_dim % self.num_heads == 0

        x = PatchEmbedBlock(patch_shape=self.patch_shape,
                            embed_dim=self.embed_dim,
                            dtype=self.dtype)(inputs)

        batch = x.shape[0]
        cls_token = self.param('cls', nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.tile(cls_token, [batch, 1, 1]), x], axis=1)

        x = Encoder(num_layers=self.num_layers,
                    num_heads=self.num_heads,
                    expand_ratio=self.expand_ratio,
                    attn_dropout_rate=self.attn_dropout_rate,
                    dropout_rate=self.dropout_rate,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype,
                    use_kernel=self.use_kernel,
                    fused_qkv=self.fused_qkv,
                    scan_layers=self.scan_layers,
                    quantized=self.quantized,
                    pos_embed=self.pos_embed,
                    attn_bias=self.attn_bias)(x, is_training=is_training)

        return nn.Dense(features=self.num_classes,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.zeros)(x[:, 0])
