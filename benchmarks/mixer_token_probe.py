"""Mixer token-mixing: transposed-FFBlock layout vs direct einsum contraction.

The shipped MixerBlock (and the reference, models/mlp_mixer.py:16-31)
materializes the transposed [B, D, L] tensor so an ordinary Dense can mix
tokens. On TPU that layout pads L=196 -> 256 lanes (1.3x) on every
token-mix intermediate and pays two relayout passes per block. The same
math is expressible with D kept in lanes throughout:

    y = gelu(einsum('bld,lk->bkd', normed, W1) + b1[:, None])
    mixed = einsum('bkd,kl->bld', y, W2) + b2[:, None]

identical parameters (W1 [L, K], b1 [K] — exactly the transposed-Dense
kernels), no transpose ops. This probe times one full mixer block
(LN -> token-mix -> res -> LN -> channel-mix -> res), fwd+bwd,
scan-chained, at mixer_b_patch16 @224 bs192 shapes.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

B, L, D = 192, 196, 768
TH, CH = 98, 3072          # tokens hidden (0.5*196), channels hidden (4*768)
STEPS = 30
DT = jnp.bfloat16


def ln(a):
    mu = a.mean(-1, keepdims=True)
    var = jnp.maximum(
        (a.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
        - mu.astype(jnp.float32) ** 2, 0.0)
    return (a - mu) * jax.lax.rsqrt(var + 1e-6).astype(a.dtype)


def block_transposed(p, x):
    """Shipped formulation: transpose so Dense mixes tokens."""
    n = ln(x)
    t = jnp.swapaxes(n, -1, -2)                       # [B, D, L]
    h = jax.nn.gelu(t @ p['tw1'] + p['tb1'])          # [B, D, TH]
    t = h @ p['tw2'] + p['tb2']                       # [B, D, L]
    x = x + jnp.swapaxes(t, -1, -2)
    n = ln(x)
    h = jax.nn.gelu(n @ p['cw1'] + p['cb1'])
    return x + h @ p['cw2'] + p['cb2']


def block_einsum(p, x):
    """Same math/params, sequence axis contracted in place."""
    n = ln(x)
    h = jax.nn.gelu(jnp.einsum('bld,lk->bkd', n, p['tw1'])
                    + p['tb1'][:, None])              # [B, TH, D]
    t = jnp.einsum('bkd,kl->bld', h, p['tw2']) + p['tb2'][:, None]
    x = x + t
    n = ln(x)
    h = jax.nn.gelu(n @ p['cw1'] + p['cb1'])
    return x + h @ p['cw2'] + p['cb2']


def block_channel_only(p, x):
    """Token mixing deleted — upper bound on what it can save."""
    n = ln(x)
    h = jax.nn.gelu(n @ p['cw1'] + p['cb1'])
    return x + h @ p['cw2'] + p['cb2']


def make_params(rng):
    ks = jax.random.split(rng, 4)
    s = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(DT)
    return {
        'tw1': s(ks[0], (L, TH)), 'tb1': jnp.zeros((TH,), DT),
        'tw2': s(ks[1], (TH, L)), 'tb2': jnp.zeros((L,), DT),
        'cw1': s(ks[2], (D, CH)), 'cb1': jnp.zeros((CH,), DT),
        'cw2': s(ks[3], (CH, D)), 'cb2': jnp.zeros((D,), DT),
    }


def bench(block):
    p = make_params(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, L, D)).astype(DT)

    def loss(p, x):
        # nonlinear reduction: a plain .sum() makes the output cotangent a
        # constant ones tensor and lets XLA fold away the top of the
        # backward (dW2 = h' @ ones), under-measuring by ~2x
        return jnp.sum(block(p, x).astype(jnp.float32) ** 2)

    @jax.jit
    def run(p, x):
        def body(carry, _):
            g = jax.grad(loss)(p, carry)
            # consume EVERY grad nonlinearly: reading only one leaf lets
            # XLA dead-code-eliminate the other dW computations, and a
            # plain sum is algebraically collapsible — both measured as
            # impossibly-fast layers (>peak TF/s) in earlier revisions
            gsum = sum(jnp.sum(v.astype(jnp.float32) ** 2)
                       for v in jax.tree_util.tree_leaves(g))
            return carry + (1e-6 * gsum).astype(DT), ()
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return y.astype(jnp.float32).sum()

    float(run(p, x0))
    best = float('inf')
    for _ in range(3):
        t = time.perf_counter()
        float(run(p, x0))
        best = min(best, (time.perf_counter() - t) / STEPS)
    return best


# numerics check (f32)
pf = {k: v.astype(jnp.float32) for k, v in make_params(
    jax.random.PRNGKey(0)).items()}
xf = jax.random.normal(jax.random.PRNGKey(1), (B // 24, L, D))
d = float(jnp.abs(block_transposed(pf, xf) - block_einsum(pf, xf)).max())
print(f'einsum vs transposed max diff (f32): {d:.2e}', flush=True)

for name, fn in (('transposed', block_transposed),
                 ('einsum', block_einsum),
                 ('channel_only', block_channel_only)):
    s = bench(fn)
    print(f'{name:>14}: {s * 1e3:.3f} ms/layer (fwd+bwd)', flush=True)
