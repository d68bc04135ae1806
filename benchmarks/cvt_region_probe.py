"""Where does CvT-13's train step go? (bs=64 @224, fwd+bwd, scan-chained)

CvT-13 runs ~1909 img/s = 33.5 ms/step at bs64 — roughly 20% MFU, so
most of the step is NOT matmul time. Lanes isolate the candidate sinks
at the real stage shapes (stage1 [64,56,56,64] L=3136, stage2
[64,28,28,192] L=784, stage3 [64,14,14,384] L=196):

  convproj   the 3x (depthwise 3x3 + BN + pointwise 1x1) q/k/v chain
  attn       the attention core at (L, L/4) after stride-2 kv
  ff         the FF sublayer (LN + Dense 4x + Dense)
  stage      a whole StageBlock (convproj + attn + out-proj + FF)

Each lane times fwd+bwd with a scan-chained jit and forced completion,
per layer, then multiplies by the stage's depth (1, 2, 10)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from sav_tpu.nn.cvt_attention import ConvProjectionBlock, CvTSelfAttentionBlock
from sav_tpu.nn.feedforward import FFBlock

B = 64
STAGES = (  # (side, ch, heads, depth)
    (56, 64, 1, 1),
    (28, 192, 3, 2),
    (14, 384, 6, 10),
)
STEPS = 30
DT = jnp.bfloat16


def time_fn(loss_fn, params, x, steps=STEPS):
    """fwd+bwd scan-chained; returns ms per iteration."""
    grad = jax.grad(loss_fn)

    @jax.jit
    def run(p, x):
        def body(c, _):
            g = grad(c, x)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-6 * b.astype(a.dtype), c, g), None
        out, _ = jax.lax.scan(body, p, None, length=steps)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32), out, 0.0)

    float(run(params, x))  # compile
    t0 = time.perf_counter()
    r = run(params, x)
    got = float(r)
    dt = (time.perf_counter() - t0) / steps * 1000
    del r, got
    return dt


class Stage1Lane(nn.Module):
    """q/k/v conv-projection chain only."""
    ch: int

    @nn.compact
    def __call__(self, x):
        q = ConvProjectionBlock(self.ch, strides=1, use_bias=False,
                                dtype=DT)(x, is_training=True)
        k = ConvProjectionBlock(self.ch, strides=2, use_bias=False,
                                dtype=DT)(x, is_training=True)
        v = ConvProjectionBlock(self.ch, strides=2, use_bias=False,
                                dtype=DT)(x, is_training=True)
        return q, k, v


class AttnLane(nn.Module):
    ch: int
    heads: int

    @nn.compact
    def __call__(self, x):
        return CvTSelfAttentionBlock(num_heads=self.heads,
                                     dtype=DT)(x, is_training=True)


class FFLane(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(dtype=DT)(t)
        return t + FFBlock(expand_ratio=4, dtype=DT)(y, is_training=True)


def lane(mod_cls, side, ch, *args):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, side, side, ch), DT)
    m = mod_cls(ch, *args)
    v = m.init({'params': jax.random.PRNGKey(1)}, x)

    def loss(p, xx):
        out = m.apply(p, xx, mutable=['batch_stats'])[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                   for l in leaves)

    return time_fn(loss, v, x)


def main():
    total = 0.0
    for side, ch, heads, depth in STAGES:
        cp = lane(Stage1Lane, side, ch)
        at = lane(AttnLane, side, ch, heads)
        ff = lane(FFLane, side, ch)
        print(f'stage side={side} ch={ch} depth={depth}: '
              f'convproj {cp:.3f}  attn(full incl proj) {at:.3f}  '
              f'ff {ff:.3f} ms/layer '
              f'-> stage attn+ff x depth = {(at + ff) * depth:.2f} ms')
        total += (at + ff) * depth
    print(f'sum of attention+ff lanes: {total:.2f} ms '
          f'(step at bs{B} measures ~33.5 ms end-to-end)')


if __name__ == '__main__':
    main()
