"""Attention-kernel microbench: Pallas flash vs XLA at given shapes.

Times forward and fwd+bwd via scan-chaining with forced completion (the
tunnel-safe methodology), reporting ms/call and achieved TFLOP/s on TRUE
(unpadded) flops.

Usage: python benchmarks/attn_kernel_bench.py [B L H D [fwd|both]]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from sav_tpu.ops import attention as attention_ops

STEPS = 50


def _chain(fn, *args, steps=STEPS, repeats=3):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(carry, *args[1:])
            return out.astype(carry.dtype), ()
        carry, _ = jax.lax.scan(body, args[0], None, length=steps)
        return carry

    out = run(*args)
    float(jnp.sum(out[:1, :1]).astype(jnp.float32))
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        out = run(*args)
        float(jnp.sum(out[:1, :1]).astype(jnp.float32))
        best = min(best, (time.perf_counter() - start) / steps)
    return best * 1e3


def main(B=192, L=197, H=12, D=64, mode='both'):
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D), jnp.bfloat16)

    fwd_gflop = 2 * 2 * B * H * L * L * D / 1e9
    paths = [('xla', False), ('kernel', True)]

    for name, use_kernel in paths:
        def fwd(q, k, v, use_kernel=use_kernel):
            out = attention_ops.multi_head_attention(
                q, k, v, use_kernel=use_kernel)
            # fold [B,L,H,D] -> carry shape [B,L,H,D]
            return out

        ms = _chain(fwd, q, k, v)
        print(f'{name:8s} fwd      {ms:7.3f} ms  '
              f'{fwd_gflop / ms:6.1f} TFLOP/s', flush=True)

        if mode == 'both':
            def train(q, k, v, use_kernel=use_kernel):
                def loss(q):
                    out = attention_ops.multi_head_attention(
                        q, k, v, use_kernel=use_kernel)
                    return jnp.sum(out.astype(jnp.float32) ** 2)
                return jax.grad(loss)(q)

            ms = _chain(train, q, k, v)
            print(f'{name:8s} fwd+bwd  {ms:7.3f} ms  '
                  f'{3 * fwd_gflop / ms:6.1f} TFLOP/s', flush=True)


if __name__ == '__main__':
    args = sys.argv[1:]
    B, L, H, D = (int(a) for a in args[:4]) if len(args) >= 4 else (192, 197, 12, 64)
    mode = args[4] if len(args) > 4 else 'both'
    main(B, L, H, D, mode)
