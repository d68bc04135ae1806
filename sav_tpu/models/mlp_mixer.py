"""MLP-Mixer (Tolstikhin et al., 2021) — attention-free token/channel mixing.

Checkpoint- and API-compatible with the reference (models/mlp_mixer.py:10-60).
The token-mixing MLP is expressed as FFBlock on the transposed ``[.., d, l]``
layout, exactly like the reference, so parameters stay drop-in compatible.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from sav_tpu.nn import FFBlock, PatchEmbedBlock


class MixerBlock(nn.Module):
    """LN -> token-mixing MLP -> residual; LN -> channel-mixing -> residual."""

    tokens_expand_ratio: float
    channels_expand_ratio: float
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'
    quantized: Union[bool, str] = False

    def _token_kernel_route(self, inputs) -> bool:
        """Route the token-mixing sublayer through the images-in-lanes
        Pallas kernel (ops.mixer_token): the transposed per-op path runs
        at ~18 TF/s — L=196 pads to 256 lanes on every intermediate and
        two relayouts bracket MXU-starved [*, 196]x[196, 98] GEMMs
        (benchmarks/mixer_token_probe.py; receipts in
        docs/PERFORMANCE.md round-3)."""
        if self.use_kernel == 'fused_token':
            assert self.activation_fn is nn.activation.gelu, \
                'fused_token path is gelu-only'
            return True
        if self.use_kernel != 'auto':
            return False
        if self.activation_fn is not nn.activation.gelu:
            return False
        import jax as _jax
        from sav_tpu.ops import mixer_token
        if _jax.default_backend() != 'tpu':
            return False       # CPU interpret mode would be a slowdown
        l, d = inputs.shape[-2], inputs.shape[-1]
        k = max(1, int(self.tokens_expand_ratio * l))
        return mixer_token.supported(l, k, d)

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        # int8 serving quantizes the CHANNEL-mix FF (wide GEMMs, the
        # int8_ff kernel's regime); the token-mix GEMMs ([L, L/2]-sized)
        # stay bf16 — too narrow for int8 to beat the quantize passes
        ch_quant = 'ff' if self.quantized in ('ff', 'all') else False

        def mlp(ratio, z, name=None, quantized=False):
            return FFBlock(expand_ratio=ratio,
                           activation_fn=self.activation_fn,
                           dtype=self.dtype,
                           quantized=quantized,
                           name=name)(z, is_training=is_training)

        if self._token_kernel_route(inputs):
            # one custom_vjp span for LN -> token-mix -> residual;
            # parameter tree identical to the per-op path below
            from sav_tpu.nn.attention import LayerNormParams
            from sav_tpu.nn.feedforward import FFParams
            from sav_tpu.ops import mixer_token

            l, d = inputs.shape[-2], inputs.shape[-1]
            ls, lb = LayerNormParams(d, name='LayerNorm_0')()
            w1, b1, w2, b2 = FFParams(
                l, max(1, int(self.tokens_expand_ratio * l)),
                name='FFBlock_0')()
            tokens = mixer_token.token_mix_sublayer(
                inputs.astype(self.dtype), ls, lb, w1, b1, w2, b2)
            channels = mlp(self.channels_expand_ratio,
                           nn.LayerNorm(dtype=self.dtype,
                                        name='LayerNorm_1')(tokens),
                           name='FFBlock_1', quantized=ch_quant)
            return tokens + channels

        # token mixing: transpose so the MLP contracts over the sequence
        # axis, then transpose back before the residual
        normed = nn.LayerNorm(dtype=self.dtype)(inputs)
        mixed = mlp(self.tokens_expand_ratio,
                    rearrange(normed, '... l d -> ... d l'))
        tokens = inputs + rearrange(mixed, '... d l -> ... l d')

        # channel mixing: an ordinary transformer MLP on the features
        channels = mlp(self.channels_expand_ratio,
                       nn.LayerNorm(dtype=self.dtype)(tokens),
                       quantized=ch_quant)
        return tokens + channels


class ScanMixerBlock(MixerBlock):
    """MixerBlock with a scan-compatible (carry, broadcast) signature."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, is_training=is_training), None


class MLPMixer(nn.Module):
    """MLP-Mixer classifier over NHWC images."""

    num_classes: int
    num_layers: int
    embed_dim: int
    patch_shape: Tuple[int, int]
    tokens_expand_ratio: float = 0.5
    channels_expand_ratio: float = 4
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    use_kernel: Union[str, bool] = 'auto'
    quantized: Union[bool, str] = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        if self.quantized and self.quantized not in ('ff', 'all'):
            raise ValueError(
                f'MLPMixer quantized={self.quantized!r} is not supported: '
                "only 'ff'/'all' (channel-mix FFs int8; token-mix GEMMs "
                'are too narrow to beat the quantize passes). Use '
                "--quantized ff for int8 serving.")
        x = PatchEmbedBlock(patch_shape=self.patch_shape,
                            embed_dim=self.embed_dim,
                            use_bias=True,
                            dtype=self.dtype)(inputs)

        block_kwargs = dict(tokens_expand_ratio=self.tokens_expand_ratio,
                            channels_expand_ratio=self.channels_expand_ratio,
                            activation_fn=self.activation_fn,
                            dtype=self.dtype,
                            use_kernel=self.use_kernel,
                            quantized=self.quantized)
        if self.scan_layers:
            scanned = nn.scan(ScanMixerBlock,
                              variable_axes={'params': 0},
                              split_rngs={'params': True, 'dropout': True},
                              in_axes=nn.broadcast,
                              length=self.num_layers)
            x, _ = scanned(name='MixerBlock', **block_kwargs)(x, is_training)
        else:
            for _ in range(self.num_layers):
                x = MixerBlock(**block_kwargs)(x, is_training=is_training)

        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(features=self.num_classes, dtype=self.dtype)(x)
