"""CvT-13 SERVING-side conv-projection fusion probe (VERDICT r3 #3).

At inference BatchNorm uses frozen running stats — the cross-block
batch-statistics barrier that closed the TRAINING fusion probe
(cvt_region_probe.py) does not exist. This quantifies whether a fused
conv-proj+BN+attention serving span has headroom, lane by lane at the
real stage shapes (bs=256 @224, forward only, frozen BN):

  convproj     3x (depthwise 3x3 + frozen BN + pointwise 1x1) q/k/v
  nobn         same chain with the BN affine deleted — if XLA folds the
               frozen affine into the pointwise GEMM (as it does LN,
               round-2 receipts), this ties convproj and a fused span
               has nothing to win from the BN
  pwonly       the three pointwise GEMMs alone ([B*L, C] @ [C, C]) —
               the MXU floor of the projection chain
  dwonly       the three depthwise 3x3 convs alone — the VPU/window part
  attn         whole CvTSelfAttentionBlock (projections + core + out)
  stage        whole StageBlock (attention + FF + residuals)

Reference match: models/layers/attentions/cvt_attention.py:27-39
(conv_projection), models/cvt.py stage blocks.
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from sav_tpu.nn.cvt_attention import (ConvProjectionBlock,
                                      CvTSelfAttentionBlock)
from sav_tpu.models.cvt import StageBlock

B = 256
STAGES = (  # (side, ch, heads, depth)
    (56, 64, 1, 1),
    (28, 192, 3, 2),
    (14, 384, 6, 10),
)
STEPS = 20
DT = jnp.bfloat16


def time_fwd(apply_fn, params, x, steps=STEPS):
    @jax.jit
    def run(p, x):
        def body(c, _):
            out = apply_fn(p, c)
            leaves = jax.tree_util.tree_leaves(out)
            bump = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return c + (bump * 1e-12).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(out).astype(jnp.float32)

    float(run(params, x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        best = min(best, (time.perf_counter() - t0) / steps * 1000)
    return best


class ConvProjLane(nn.Module):
    ch: int
    strip_bn: bool = False

    @nn.compact
    def __call__(self, x):
        if self.strip_bn:
            outs = []
            for strides in (1, 2, 2):
                y = nn.Conv(self.ch, kernel_size=(3, 3),
                            strides=(strides,) * 2, padding='SAME',
                            feature_group_count=self.ch, use_bias=False,
                            dtype=DT)(x)
                outs.append(nn.Conv(self.ch, kernel_size=(1, 1),
                                    use_bias=False, dtype=DT)(y))
            return tuple(outs)
        return tuple(
            ConvProjectionBlock(self.ch, strides=s, use_bias=False,
                                dtype=DT)(x, is_training=False)
            for s in (1, 2, 2))


class PwOnlyLane(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        return tuple(nn.Dense(self.ch, use_bias=False, dtype=DT)(t)
                     for _ in range(3))


class DwOnlyLane(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        return tuple(
            nn.Conv(self.ch, kernel_size=(3, 3), strides=(s,) * 2,
                    padding='SAME', feature_group_count=self.ch,
                    use_bias=False, dtype=DT)(x)
            for s in (1, 2, 2))


class AttnLane(nn.Module):
    ch: int
    heads: int

    @nn.compact
    def __call__(self, x):
        return CvTSelfAttentionBlock(num_heads=self.heads, dtype=DT)(
            x, is_training=False)


class StageLane(nn.Module):
    ch: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)     # StageBlock takes [B, L, C]
        return StageBlock(num_heads=self.heads, embed_dim=self.ch,
                          dtype=DT)(tokens, is_training=False)


def lane(mod, side, ch, name, depth):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, side, side, ch), DT)
    v = jax.jit(mod.init)(jax.random.PRNGKey(1), x)
    apply_fn = lambda p, c: mod.apply(p, c)
    ms = time_fwd(apply_fn, v, x)
    print(f'  {name:<10} {ms:8.3f} ms/layer  x{depth} = {ms * depth:8.2f}',
          flush=True)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for side, ch, heads, depth in STAGES:
        if only and str(ch) != only:
            continue
        print(f'stage [{B},{side},{side},{ch}] heads={heads} '
              f'depth={depth}:', flush=True)
        lane(ConvProjLane(ch), side, ch, 'convproj', depth)
        lane(ConvProjLane(ch, strip_bn=True), side, ch, 'nobn', depth)
        lane(PwOnlyLane(ch), side, ch, 'pwonly', depth)
        lane(DwOnlyLane(ch), side, ch, 'dwonly', depth)
        lane(AttnLane(ch, heads), side, ch, 'attn', depth)
        lane(StageLane(ch, heads), side, ch, 'stage', depth)


if __name__ == '__main__':
    main()
