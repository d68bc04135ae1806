"""BoTNet: Bottleneck Transformers (Srinivas et al., 2021).

A ResNet-50-style backbone whose last stage replaces the 3x3 conv with
all-to-all multi-head self-attention over the 2-D grid, with decomposed 2-D
relative-position logits.

Behavior-compatible with the reference (models/botnet.py:17-331) with its
mid-refactor crashes fixed (the reference forward cannot run as-is):
  * ``BoTMHSA`` referenced undefined ``self.head_dim`` (botnet.py:185); the
    scale here uses the actual head width.
  * ``BoTBlock`` referenced a nonexistent ``self.config`` and passed
    ``config=`` to BoTMHSA (botnet.py:227,232); the head count is threaded
    explicitly instead.
  * The call argument is ``is_training`` for uniformity with the rest of the
    zoo (reference used ``train``, which the reference's own trainer never
    passed correctly).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn
from jax.nn import initializers

from sav_tpu.nn import SqueezeExciteBlock
from sav_tpu.ops import attention as attention_ops

ModuleDef = Any


class BottleneckResNetBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with BN, squeeze-excite and residual."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int]
    se_ratio: float = 0.0625
    projection_factor: int = 4
    activation_fn: Callable = nn.activation.swish
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        residual = inputs

        y = self.conv(self.filters, kernel_size=(1, 1))(inputs)
        y = self.norm()(y)
        y = self.activation_fn(y)
        y = self.conv(self.filters, kernel_size=(3, 3),
                      strides=self.strides)(y)
        y = self.norm()(y)
        y = self.activation_fn(y)
        y = self.conv(self.filters * self.projection_factor,
                      kernel_size=(1, 1))(y)
        y = self.norm(scale_init=initializers.zeros)(y)

        if self.se_ratio is not None:
            y = SqueezeExciteBlock(se_ratio=self.se_ratio,
                                   activation_fn=self.activation_fn,
                                   dtype=self.dtype)(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.projection_factor,
                                 kernel_size=(1, 1),
                                 strides=self.strides)(residual)
            residual = self.norm()(residual)
            residual = self.activation_fn(residual)

        return self.activation_fn(residual + y)


# canonical implementation lives next to the fused kernel; re-exported
# here for compatibility (probes/tests import it from this module)
from sav_tpu.ops.botnet_attention import relative_shift  # noqa: E402,F401


class RelativeLogits(nn.Module):
    """Decomposed 2-D relative-position logits for a ``[B,h,H,W,d]`` query.

    Returns ``[B, h, H, W, P, Q]`` where entry (p, q) holds
    ``q . r_{P-p}  +  q . r_{Q-q}`` with learned per-axis relative
    embeddings of shape ``(2*size - 1, head_dim)``
    (reference: models/botnet.py:70-141).

    The two 1-D contributions each depend on only ONE key coordinate, so
    they are kept at ``[B,h,H,W,P]`` / ``[B,h,H,W,Q]`` and combined by a
    broadcast add — the reference's ``jnp.tile`` to full 6-D per axis
    (botnet.py:95-111) is dropped; XLA fuses the broadcast into the logits
    epilogue, so nothing key-grid-squared is materialized beyond the
    attention logits themselves. At the reference's own 384-resolution test
    point (botnet_test.py:13-23) this is ~3x less peak bias memory.
    """

    head_ch: int
    decompose: bool = False

    @staticmethod
    def _relative_logits_1d(query, rel_pos_emb):
        """[B,h,H,W,d] x [2W-1,d] -> [B,h,H,W,V] logits over key columns."""
        height = query.shape[2]
        x = jnp.einsum('bhHWd,md->bhHWm', query, rel_pos_emb)
        x = rearrange(x, 'b h H W m -> b (h H) W m')
        x = relative_shift(x)
        return rearrange(x, 'b (h H) W V -> b h H W V', H=height)

    @nn.compact
    def __call__(self, query):
        _, _, height, width, _ = query.shape

        rel_pos_emb_w = self.param(
            'rel_pos_emb_w',
            initializers.normal(stddev=self.head_ch ** -0.5),
            (2 * width - 1, self.head_ch))
        rel_pos_emb_h = self.param(
            'rel_pos_emb_h',
            initializers.normal(stddev=self.head_ch ** -0.5),
            (2 * height - 1, self.head_ch))

        if self.decompose:
            # kernel route: the fused core (ops.botnet_attention) expands
            # the per-axis terms in VMEM — hand back the raw embeddings
            return rel_pos_emb_h, rel_pos_emb_w

        # [B,h,H,W,Q]: width-offset term, same for every key row P
        rel_w = self._relative_logits_1d(query, rel_pos_emb_w)
        # [B,h,H,W,P]: height-offset term, same for every key column Q
        rel_h = rearrange(
            self._relative_logits_1d(
                rearrange(query, 'b h H W d -> b h W H d'), rel_pos_emb_h),
            'b h W H P -> b h H W P')
        return rel_h[..., :, None] + rel_w[..., None, :]


class BoTMHSA(nn.Module):
    """All-pairs MHSA over the 2-D grid with relative-position logits.

    ``use_kernel='botnet_fused'`` routes through the fused rel-pos
    Pallas core (ops.botnet_attention) — opt-in only; see _fused_route
    for the measured closure. Param tree is identical on both routes
    (same conv modules, same RelativeLogits params).
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = initializers.he_uniform()
    use_kernel: Any = 'auto'

    def _fused_route(self, height: int, width: int, head_ch: int) -> bool:
        # NOT auto-routed: the fused core MEASURED a tie-to-loss against
        # XLA's broadcast-add bias path at botnet_t3 stage shapes
        # (benchmarks/botnet_region_probe.py: 2.154 vs 2.069 ms/layer
        # fwd+bwd) — the ~0.5 ms/layer bias-materialization saving is
        # consumed by the custom_vjp boundary tax at this region size
        # (the flash @224 closure's mechanism). Kept opt-in,
        # equality-tested; receipts in docs/PERFORMANCE.md round-4.
        if self.use_kernel == 'botnet_fused':
            from sav_tpu.ops import botnet_attention as ba
            assert (height == width
                    and ba.supported(height, self.num_heads, head_ch)), (
                'botnet_fused needs a square grid and supported geometry')
            return True
        return False

    @nn.compact
    def __call__(self, inputs):
        _, height, width, in_ch = inputs.shape
        assert in_ch % self.num_heads == 0
        head_ch = in_ch // self.num_heads

        conv = functools.partial(nn.Conv,
                                 features=in_ch,
                                 kernel_size=(1, 1),
                                 use_bias=False,
                                 dtype=self.dtype,
                                 kernel_init=self.kernel_init)
        split_heads = functools.partial(rearrange,
                                        pattern='b H W (h d) -> b h H W d',
                                        h=self.num_heads)
        query_b = conv(name='query')(inputs)            # [B, H, W, h*d]
        key_b = conv(name='key')(inputs)
        value_b = conv(name='value')(inputs)

        if self._fused_route(height, width, head_ch):
            from sav_tpu.ops import botnet_attention as ba
            scale = jnp.sqrt(head_ch).astype(query_b.dtype)
            bands = functools.partial(rearrange,
                                      pattern='b H W c -> b (H W) c')
            # decompose=True only hands back the embeddings; the shapes
            # (and the param tree) are identical to the jnp route
            emb_h, emb_w = RelativeLogits(
                head_ch=head_ch, decompose=True)(
                    split_heads(query_b) / scale)
            out = ba.botnet_mhsa(bands(query_b) / scale, bands(key_b),
                                 bands(value_b), emb_h, emb_w,
                                 self.num_heads, height)
            return rearrange(out, 'b (H W) c -> b H W c', H=height)

        query = split_heads(query_b)
        key = split_heads(key_b)
        value = split_heads(value_b)

        scaled_query = query / jnp.sqrt(head_ch).astype(query.dtype)
        bias = RelativeLogits(head_ch=head_ch)(scaled_query)
        bias = rearrange(bias, 'b h H W P Q -> b h (H W) (P Q)')

        flatten = functools.partial(rearrange,
                                    pattern='b h H W d -> b (H W) h d')
        out = attention_ops.multi_head_attention(
            flatten(query), flatten(key), flatten(value), bias=bias)
        return rearrange(out, 'b (H W) h d -> b H W (h d)', H=height, W=width)


class BoTBlock(nn.Module):
    """Bottleneck block with MHSA in place of the 3x3 conv."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int]
    num_heads: int = 4
    projection_factor: int = 4
    activation_fn: Callable = nn.swish
    dtype: jnp.dtype = jnp.float32
    use_kernel: Any = 'auto'

    @nn.compact
    def __call__(self, inputs):
        residual = inputs

        y = self.conv(self.filters, kernel_size=(1, 1))(inputs)
        y = self.norm()(y)
        y = self.activation_fn(y)
        y = BoTMHSA(num_heads=self.num_heads, dtype=self.dtype,
                    use_kernel=self.use_kernel)(y)
        if self.strides == (2, 2):
            y = nn.avg_pool(y, window_shape=(2, 2), strides=self.strides,
                            padding='SAME')
        y = self.norm()(y)
        y = self.activation_fn(y)
        y = self.conv(self.filters * self.projection_factor,
                      kernel_size=(1, 1))(y)
        y = self.norm(scale_init=initializers.zeros)(y)

        if self.strides == (2, 2) or residual.shape != y.shape:
            residual = self.conv(self.filters * self.projection_factor,
                                 kernel_size=(1, 1),
                                 strides=self.strides)(residual)
            residual = self.norm()(residual)
            residual = self.activation_fn(residual)

        return self.activation_fn(residual + y)


class BoTNet(nn.Module):
    """BoTNet classifier: conv stem, three ResNet stages, one BoT stage."""

    num_classes: int
    stage_sizes: Tuple[int, ...]
    stride_one: bool = True
    se_ratio: float = 0.0625
    activation_fn: Callable = nn.swish
    num_heads: int = 4
    initial_filters: int = 64
    projection_factor: int = 4
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = initializers.he_uniform()
    bias_init: Callable = initializers.normal(stddev=1e-6)
    use_kernel: Any = 'auto'

    @nn.compact
    def __call__(self, inputs, is_training: bool = True):
        conv = functools.partial(nn.Conv,
                                 use_bias=False,
                                 dtype=self.dtype,
                                 kernel_init=self.kernel_init)
        norm = functools.partial(nn.BatchNorm,
                                 use_running_average=not is_training,
                                 momentum=self.bn_momentum,
                                 epsilon=self.bn_epsilon,
                                 dtype=self.dtype)

        y = conv(self.initial_filters,
                 kernel_size=(7, 7),
                 strides=(2, 2),
                 padding=[(3, 3), (3, 3)])(inputs)
        y = norm()(y)
        y = self.activation_fn(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding='SAME')

        for i, stage_size in enumerate(self.stage_sizes[:-1]):
            for j in range(stage_size):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                y = BottleneckResNetBlock(
                    filters=self.initial_filters * 2 ** i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    se_ratio=self.se_ratio,
                    projection_factor=self.projection_factor,
                    activation_fn=self.activation_fn,
                    dtype=self.dtype)(y)

        last = len(self.stage_sizes) - 1
        for j in range(self.stage_sizes[-1]):
            strides = (2, 2) if j == 0 and not self.stride_one else (1, 1)
            y = BoTBlock(filters=self.initial_filters * 2 ** last,
                         strides=strides,
                         conv=conv,
                         norm=norm,
                         num_heads=self.num_heads,
                         projection_factor=self.projection_factor,
                         activation_fn=self.activation_fn,
                         dtype=self.dtype,
                         use_kernel=self.use_kernel)(y)

        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.num_classes,
                     dtype=self.dtype,
                     kernel_init=self.kernel_init,
                     bias_init=self.bias_init)(y)
        return jnp.asarray(y, dtype=self.dtype)
