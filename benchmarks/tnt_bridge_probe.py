"""TNT Inner2Outer bridge in isolation (VERDICT r3 #6: never measured).

The bridge (models/tnt.py Inner2OuterBlock, reference tnt.py:36-50)
folds the pixel tokens flat — ``[B*196, 16, 24] -> [B*196, 384]`` — then
projects to the outer width and adds to the patch embeddings. The input
lives in the SAME lane-padded layout (16/24-wide trailing dims -> 128
lanes) whose 8x bandwidth tax motivated the inner kernel; the fold is a
real relayout, not free metadata.

Lanes (fwd+bwd, scan-chained, TNT-S shapes at bs64):

  bridge        rearrange + Dense + cls-pad + residual, from [BP, 16, 24]
  bridge-flat   same from a pre-folded [BP, 384] input — the delta is
                the fold/relayout cost (what an inner-kernel epilogue
                that wrote folded layout would recover)
  dense-only    the bare [BP,384]x[384,384] GEMM floor

Usage: python benchmarks/tnt_bridge_probe.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
from einops import rearrange

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
P, N, D, OUT = 196, 16, 24, 384      # patches/img, pixel tokens, widths
STEPS = 30


def timed(loss_fn, params, *args):
    grad = jax.grad(loss_fn)

    @jax.jit
    def run(p, *a):
        def body(c, _):
            g = grad(c, *a)
            return jax.tree_util.tree_map(
                lambda x, y: x - 1e-6 * y.astype(x.dtype), c, g), ()
        p, _ = jax.lax.scan(body, p, None, length=STEPS)
        return p

    out = run(params, *args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params, *args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      ).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pixels = jax.random.normal(ks[0], (B * P, N, D), jnp.bfloat16)
    pixels_flat = pixels.reshape(B * P, N * D)
    patches = jax.random.normal(ks[1], (B, P + 1, OUT), jnp.bfloat16)
    w = jax.random.normal(ks[2], (N * D, OUT), jnp.bfloat16) / 19.6
    b = jnp.zeros((OUT,), jnp.bfloat16)

    def bridge(p, pix, pat):
        x = rearrange(pix, 'bp n d -> bp (n d)')
        x = x @ p['w'] + p['b']
        x = rearrange(x, '(b l) d -> b l d', b=B)
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
        return x + pat

    def bridge_flat(p, pixf, pat):
        x = pixf @ p['w'] + p['b']
        x = rearrange(x, '(b l) d -> b l d', b=B)
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
        return x + pat

    def dense_only(p, pixf):
        return pixf @ p['w'] + p['b']

    params = {'w': w, 'b': b}
    loss = lambda fn, *a: (lambda p: jnp.sum(jnp.square(
        fn(p, *a).astype(jnp.float32))))
    for name, fn, args in [
            ('bridge', bridge, (pixels, patches)),
            ('bridge-flat', bridge_flat, (pixels_flat, patches)),
            ('dense-only', dense_only, (pixels_flat,))]:
        ms = timed(loss(fn, *args), params)
        print(f'{name:<12} {ms:8.3f} ms/layer  x12 = {ms * 12:7.2f} ms',
              flush=True)


if __name__ == '__main__':
    main()
