"""BoTMHSA region cost at botnet_t3 stage shapes (B=64, 14x14 grid,
D=512, h=4, d=128) — quantifies what the rel-pos logits add to the plain
SA sublayer before any kernel is built (VERDICT r3 #1: the last perf
claim closed by reasoning instead of measurement).

Lanes (fwd+bwd, scan-chained; `--fwd` for forward-only):

  xla SA          qkv 1x1 convs (as matmuls) + attention, NO rel bias
  xla SA+rel      same plus decomposed rel-pos logits, broadcast-add
                  bias (our models/botnet.py path)
  xla SA+rel6d    same but the bias tiled to full 6-D before the add
                  (the reference's jnp.tile layout, botnet.py:95-111)
  fused rel       rel-bias-inside-the-kernel fused sublayer
                  (ops/botnet_attention.py), when available

The delta x 6 BoT blocks against the measured ~48 ms botnet_t3 step
bounds the end-to-end win of a fused rel-pos kernel.

Reference match: /root/reference/models/botnet.py:70-141 (RelativeLogits),
144-199 (BoTMHSA).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from einops import rearrange

sys.path.insert(0, '.')

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from sav_tpu.models.botnet import relative_shift  # noqa: E402

B, G, D, H, HD = 64, 14, 512, 4, 128  # grid GxG, heads H, head_ch HD
if len(sys.argv) > 1 and not sys.argv[1].startswith('-'):
    B, G = int(sys.argv[1]), int(sys.argv[2])
L = G * G
STEPS = 30


def rel_logits_1d(query5, emb):
    """[B,h,G,G,d] x [2G-1,d] -> [B,h,G,G,V] logits over key columns."""
    x = jnp.einsum('bhHWd,md->bhHWm', query5, emb)
    x = rearrange(x, 'b h H W m -> b (h H) W m')
    x = relative_shift(x)
    return rearrange(x, 'b (h H) W V -> b h H W V', H=G)


def sublayer(p, x, rel, tile6d=False):
    """x: [B, L, D].  qkv 1x1 convs + rel-pos attention, no out-proj."""
    q = jnp.einsum('bld,dhk->blhk', x, p['wq'])
    k = jnp.einsum('bld,dhk->blhk', x, p['wk'])
    v = jnp.einsum('bld,dhk->blhk', x, p['wv'])
    q = q / jnp.sqrt(jnp.asarray(HD, x.dtype))
    s = jnp.einsum('bqhc,bphc->bhqp', q, k)     # [B, H, L, L]
    if rel:
        q5 = rearrange(q, 'b (H W) h d -> b h H W d', H=G)
        rel_w = rel_logits_1d(q5, p['emb_w'])              # [B,h,H,W,Q]
        rel_h = rearrange(
            rel_logits_1d(rearrange(q5, 'b h H W d -> b h W H d'),
                          p['emb_h']),
            'b h W H P -> b h H W P')                      # [B,h,H,W,P]
        if tile6d:
            bias6 = (jnp.tile(rel_h[:, :, :, :, :, None], (1, 1, 1, 1, 1, G))
                     + jnp.tile(rel_w[:, :, :, :, None, :],
                                (1, 1, 1, 1, G, 1)))
        else:
            bias6 = rel_h[..., :, None] + rel_w[..., None, :]
        s = s + rearrange(bias6, 'b h H W P Q -> b h (H W) (P Q)')
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum('bhqp,bphc->bqhc', a, v)
    return x + rearrange(o, 'b q h c -> b q (h c)')


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (B, L, D), jnp.bfloat16)
    p = {
        'wq': jax.random.normal(ks[1], (D, H, HD), jnp.bfloat16) / D ** .5,
        'wk': jax.random.normal(ks[2], (D, H, HD), jnp.bfloat16) / D ** .5,
        'wv': jax.random.normal(ks[3], (D, H, HD), jnp.bfloat16) / D ** .5,
        'emb_w': jax.random.normal(ks[4], (2 * G - 1, HD),
                                   jnp.bfloat16) * HD ** -.5,
        'emb_h': jax.random.normal(ks[5], (2 * G - 1, HD),
                                   jnp.bfloat16) * HD ** -.5,
    }

    lanes = [
        ('xla SA', lambda p, x: sublayer(p, x, False)),
        ('xla SA+rel', lambda p, x: sublayer(p, x, True)),
        ('xla SA+rel6d', lambda p, x: sublayer(p, x, True, tile6d=True)),
    ]
    try:
        from sav_tpu.ops import botnet_attention
        if botnet_attention.supported(G, H, HD):
            def fused(p, x):
                return x + botnet_attention.botnet_attention_sublayer(
                    x, p['wq'], p['wk'], p['wv'], p['emb_h'], p['emb_w'],
                    H, G)
            lanes.append(('fused rel', fused))
    except ImportError:
        pass

    fwd_only = '--fwd' in sys.argv
    for name, fn in lanes:
        def loss(p, x):
            return jnp.sum(jnp.square(fn(p, x).astype(jnp.float32)))
        grad_fn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(p, x):
            def body(carry, _):
                p, x = carry
                if fwd_only:
                    return (p, x - 1e-6 * fn(p, x)), ()
                gp, gx = grad_fn(p, x)
                p = jax.tree_util.tree_map(
                    lambda a, g: a - 1e-6 * g.astype(a.dtype), p, gp)
                return (p, x - 1e-6 * gx.astype(x.dtype)), ()
            (p, x), _ = jax.lax.scan(body, (p, x), None, length=STEPS)
            return x

        out = run(p, x)
        float(jnp.sum(out).astype(jnp.float32))
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            out = run(p, x)
            float(jnp.sum(out).astype(jnp.float32))
            best = min(best, (time.perf_counter() - start) / STEPS)
        print(f'grad {name:<14}{best * 1e3:8.3f} ms/layer  '
              f'x6 = {best * 6e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
