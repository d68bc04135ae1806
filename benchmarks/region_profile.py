"""Region-by-region train-step decomposition for the ViT encoder.

The axon tunnel blocks ``jax.profiler`` device traces, so this does the
decomposition the way the timing rules allow (scan-chained jits, forced
completion): each encoder region runs as its own chained fwd+bwd step at the
exact shapes the headline config uses, and the table reports ms/step,
achieved TFLOP/s (for matmul regions) and achieved GB/s (for bandwidth
regions). The sum of parts vs the whole shows how much XLA's cross-region
fusion buys, and where the non-MXU time lives.

Usage: python benchmarks/region_profile.py [batch] [seqlen] [dim]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

B, L, D, H, FF = 192, 197, 768, 12, 3072
STEPS = 30


def _time_grad(loss_fn, params, *args, steps=STEPS, repeats=3):
    """Chained fwd+bwd of ``loss_fn(params, *args)``; returns ms/step."""
    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def run(params, *args):
        def body(p, _):
            g = grad_fn(p, *args)
            # SGD-flavored carry keeps the loop state-dependent
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g), ()
        params, _ = jax.lax.scan(body, params, None, length=steps)
        return params

    out = run(params, *args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        out = run(params, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        best = min(best, (time.perf_counter() - start) / steps)
    return best * 1e3


def report(name, ms, gflop=None, gbyte=None):
    cols = [f'{name:<28} {ms:8.3f} ms']
    if gflop:
        cols.append(f'{gflop / ms:8.1f} TFLOP/s')   # GFLOP/ms == TFLOP/s
    if gbyte:
        cols.append(f'{gbyte / ms * 1e3:8.0f} GB/s')
    print('  '.join(cols), flush=True)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, L, D), jnp.bfloat16)

    def mk(*shape):
        return (jax.random.normal(rng, shape, jnp.bfloat16)
                / jnp.sqrt(shape[0]).astype(jnp.bfloat16))

    n_layers = 2   # inner-scan depth: keeps the grad residuals inside HBM

    # --- FF block: x @ W1 -> gelu -> @ W2, residual (per layer) ----------
    def ff_loss(p, x):
        def layer(h, _):
            y = h @ p['w1']
            y = jax.nn.gelu(y)
            y = y @ p['w2']
            return h + y, ()
        h, _ = jax.lax.scan(layer, x, None, length=n_layers)
        return jnp.sum(h.astype(jnp.float32))

    ff_params = {'w1': mk(D, FF), 'w2': mk(FF, D)}
    ff_flops = 2 * 2 * B * L * D * FF * n_layers * 3 / 1e9   # fwd+bwd(2x)
    report(f'FF stack ({n_layers}x)', _time_grad(ff_loss, ff_params, x), ff_flops)

    # --- projections: q,k,v,out (4 DxD matmuls per layer) ----------------
    def proj_loss(p, x):
        def layer(h, _):
            q = h @ p['wq']; k = h @ p['wk']; v = h @ p['wv']
            return (q + k + v) @ p['wo'] + h, ()
        h, _ = jax.lax.scan(layer, x, None, length=n_layers)
        return jnp.sum(h.astype(jnp.float32))

    proj_params = {k: mk(D, D) for k in ('wq', 'wk', 'wv', 'wo')}
    proj_flops = 4 * 2 * B * L * D * D * n_layers * 3 / 1e9
    report(f'qkv+out projections ({n_layers}x)',
           _time_grad(proj_loss, proj_params, x), proj_flops)

    # --- attention core: einsums + softmax (no projections) --------------
    def attn_loss(p, q, k, v):
        def layer(q, _):
            logits = jnp.einsum('bqhd,bkhd->bhqk', q * p['scale'], k)
            w = jax.nn.softmax(logits)
            o = jnp.einsum('bhqk,bkhd->bqhd', w, v)
            return o, ()
        q, _ = jax.lax.scan(layer, q, None, length=n_layers)
        return jnp.sum(q.astype(jnp.float32))

    qkv = jax.random.normal(rng, (B, L, H, D // H), jnp.bfloat16)
    attn_params = {'scale': jnp.ones((), jnp.bfloat16)}
    attn_flops = 2 * 2 * B * H * L * L * (D // H) * n_layers * 3 / 1e9
    report(f'attention core ({n_layers}x)',
           _time_grad(attn_loss, attn_params, qkv, qkv, qkv), attn_flops)

    # --- LayerNorm stack (24 instances) -----------------------------------
    def ln_loss(p, x):
        def layer(h, _):
            mu = jnp.mean(h, -1, keepdims=True)
            var = jnp.mean(jnp.square(h - mu), -1, keepdims=True)
            h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * p['g'] + p['b']
            return h, ()
        h, _ = jax.lax.scan(layer, x, None, length=2 * n_layers)
        return jnp.sum(h.astype(jnp.float32))

    ln_params = {'g': jnp.ones((D,), jnp.bfloat16),
                 'b': jnp.zeros((D,), jnp.bfloat16)}
    # fwd: read+write per LN; bwd roughly 2x that traffic
    ln_bytes = B * L * D * 2 * 2 * (2 * n_layers) * 3 / 1e9
    report(f'LayerNorm stack ({2*n_layers}x)', _time_grad(ln_loss, ln_params, x),
           None, ln_bytes)

    # --- full encoder layer stack (the real model region) ----------------
    from sav_tpu.models import create_model
    model = create_model('vit_b_patch16', num_classes=1000,
                         dtype=jnp.bfloat16)
    img = jax.random.normal(rng, (B, 224, 224, 3), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, 224, 224, 3)),
        is_training=False)

    def model_loss(p, img):
        logits = model.apply(p, img, is_training=False)
        return jnp.sum(logits.astype(jnp.float32))

    total_flops = 35.2 * B * 3   # GFLOP (35.2 GFLOP/img fwd, x3 train)
    report('full model fwd+bwd', _time_grad(model_loss, variables, img),
           total_flops)


if __name__ == '__main__':
    main()
