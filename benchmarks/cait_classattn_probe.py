"""CaiT 1-query class-attention epilogue probe (VERDICT r2 #9).

The class-attention head (sav_tpu/models/cait.py CAEncoderBlock) runs a
1-query attention through the generic AttentionBlock math: a [B, H, 1, L]
logits tensor, softmax, value einsum. This probe measures whether a
squeezed formulation — the length-1 query axis eliminated, so the whole
epilogue is two [B,H,L]-shaped contractions around a softmax — buys
anything at CaiT bench shapes, fwd+bwd, scan-chained.

    python benchmarks/cait_classattn_probe.py [--img 224|384]

Prints one JSON line with both region timings.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')


def current_core(q1, k, v):
    """Today's path: generic MHA with q_len=1 ([B,1,H,d] query)."""
    logits = jnp.einsum('bqhd,bkhd->bhqk', q1, k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits).astype(v.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', p, v)


def squeezed_core(q1, k, v):
    """Query axis squeezed: [B,H,d] x [B,L,H,d] -> [B,H,L] -> [B,H,d]."""
    q = q1[:, 0]
    logits = jnp.einsum('bhd,bkhd->bhk', q, k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits).astype(v.dtype)
    return jnp.einsum('bhk,bkhd->bhd', p, v)[:, None]


def time_region(core, batch, l, heads, d, steps=50, repeats=3):
    rng = jax.random.PRNGKey(0)
    rq, rk, rv = jax.random.split(rng, 3)
    q1 = jax.random.normal(rq, (batch, 1, heads, d), jnp.bfloat16)
    k = jax.random.normal(rk, (batch, l, heads, d), jnp.bfloat16)
    v = jax.random.normal(rv, (batch, l, heads, d), jnp.bfloat16)

    def loss(q1, k, v):
        return jnp.sum(core(q1, k, v).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q1, k, v):
        def body(carry, _):
            dq, dk, dv = grad(carry[0], carry[1], carry[2])
            # feed grads back in so the scan can't be collapsed
            return (carry[0] + 1e-6 * dq.astype(carry[0].dtype),
                    carry[1] + 1e-6 * dk.astype(carry[1].dtype),
                    carry[2] + 1e-6 * dv.astype(carry[2].dtype)), ()
        (q1, k, v), _ = jax.lax.scan(body, (q1, k, v), None, length=steps)
        return jnp.sum(q1.astype(jnp.float32))

    out = run(q1, k, v)
    float(out)
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        float(run(q1, k, v))
        best = min(best, (time.perf_counter() - start) / steps)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--img', type=int, default=224)
    parser.add_argument('--batch-size', type=int, default=None)
    args = parser.parse_args()
    # CaiT-S24: dim 384, 8 heads, d=48; L = (img/16)^2 + 1 (cls in keys)
    heads, d = 8, 48
    l = (args.img // 16) ** 2 + 1
    batch = args.batch_size or (128 if args.img == 224 else 48)

    cur = time_region(current_core, batch, l, heads, d)
    sq = time_region(squeezed_core, batch, l, heads, d)
    print(json.dumps({
        'img': args.img, 'batch': batch, 'l': l,
        'current_ms': round(cur * 1e3, 4),
        'squeezed_ms': round(sq * 1e3, 4),
        'speedup': round(cur / sq, 3),
        'backend': jax.default_backend(),
    }), flush=True)


if __name__ == '__main__':
    main()
