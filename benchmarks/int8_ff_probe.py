"""Gate 2 of the int8-FF study: isolated speed at ViT-B shapes.

Measures on the chip, with scan-chained calls and forced completion
(.claude/skills/verify/SKILL.md timing rules):

  fwd      bf16 XLA FF        x @ W1 -> gelu -> @ W2 (the production path)
  fwd      int8 XLA per-GEMM  quantize + int8 dot_general x2 in XLA
  fwd      int8 whole-FF      sav_tpu.ops.int8_ff kernel (hidden in VMEM)
  fwd+bwd  bf16 XLA FF        jax.grad of the above
  fwd+bwd  int8 whole-FF QAT  kernel forward, straight-through bf16 bwd

Round-2 anatomy (docs/PERFORMANCE.md): the per-GEMM int8 path lost because
bias+gelu un-fused and only one GEMM ran int8 at a time. This probe asks
whether removing both (one kernel, both GEMMs int8, gelu between MXU
issues) clears bf16. Theoretical fwd ceiling on v5e: 2x (394 int8 vs 197
bf16 TOPS).

Usage: python benchmarks/int8_ff_probe.py [M] [D] [F]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from sav_tpu.ops import int8_ff
from sav_tpu.ops.quantized import quantize_symmetric

M, D, F = 192 * 197, 768, 3072
STEPS = 30


def _time(fn, *args, steps=STEPS, repeats=3):
    """ms per call of y = fn(x, *rest), scan-chained through the carry."""

    @jax.jit
    def run(x, *rest):
        def body(c, _):
            y = fn(c, *rest)
            return c + jnp.asarray(0.001, c.dtype) * y.astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c

    out = run(*args)
    float(jnp.sum(out).astype(jnp.float32))
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        out = run(*args)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - start) / steps)
    return best * 1e3


def main(m=M, d=D, f=F):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (m, d), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (d, f), jnp.bfloat16) / jnp.sqrt(
        jnp.asarray(d, jnp.bfloat16))
    b1 = jnp.zeros((f,), jnp.float32)
    w2 = jax.random.normal(ks[2], (f, d), jnp.bfloat16) / jnp.sqrt(
        jnp.asarray(f, jnp.bfloat16))
    b2 = jnp.zeros((d,), jnp.float32)
    w1_q, s1 = quantize_symmetric(w1.astype(jnp.float32), axis=0)
    w2_q, s2 = quantize_symmetric(w2.astype(jnp.float32), axis=0)

    gflop_fwd = 2 * (2 * m * d * f) / 1e9   # two GEMMs
    gflop_bwd = 3 * gflop_fwd               # fwd + 4 bwd GEMMs

    def bf16_ff(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1.astype(x.dtype))
        return h @ w2 + b2.astype(x.dtype)

    def int8_xla_ff(x, w1_q, s1, b1, w2_q, s2, b2):
        xq, xs = quantize_symmetric(x.astype(jnp.float32), axis=1)
        h = jax.lax.dot_general(xq, w1_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = jax.nn.gelu(h.astype(jnp.float32) * (xs * s1) + b1)
        hq, hs = quantize_symmetric(h, axis=1)
        y = jax.lax.dot_general(hq, w2_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (hs * s2) + b2).astype(x.dtype)

    ms = _time(bf16_ff, x, w1, b1, w2, b2)
    print(f'fwd  bf16 XLA        {ms:8.3f} ms  {gflop_fwd/ms:7.1f} TF/s',
          flush=True)
    ms = _time(int8_xla_ff, x, w1_q, s1, b1, w2_q, s2, b2)
    print(f'fwd  int8 XLA        {ms:8.3f} ms  {gflop_fwd/ms:7.1f} TF/s',
          flush=True)
    ms = _time(lambda x, *a: int8_ff.int8_ff_raw(x, *a).astype(x.dtype),
               x, w1_q, s1, b1, w2_q, s2, b2)
    print(f'fwd  int8 kernel     {ms:8.3f} ms  {gflop_fwd/ms:7.1f} TF/s',
          flush=True)

    # fwd+bwd: data-dependent cotangent (sum of squares), grads wrt x AND
    # params, params carried through the scan so nothing constant-folds
    def bf16_loss(p, x):
        y = bf16_ff(x, p['w1'], p['b1'], p['w2'], p['b2'])
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    def int8_loss(p, x):
        y = int8_ff.int8_ff(x, p['w1'], p['b1'], p['w2'], p['b2'])
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    params = {'w1': w1, 'b1': b1, 'w2': w2, 'b2': b2}
    for name, loss in (('bf16 XLA', bf16_loss), ('int8 QAT', int8_loss)):
        grad_fn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(p, x):
            def body(carry, _):
                p, x = carry
                gp, gx = grad_fn(p, x)
                p = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-6 * b.astype(a.dtype), p, gp)
                return (p, x - 1e-6 * gx.astype(x.dtype)), ()
            (p, x), _ = jax.lax.scan(body, (p, x), None, length=STEPS)
            return p

        out = run(params, x)
        float(jnp.sum(out['w1']).astype(jnp.float32))
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            out = run(params, x)
            float(jnp.sum(out['w1']).astype(jnp.float32))
            best = min(best, (time.perf_counter() - start) / STEPS)
        ms = best * 1e3
        print(f'grad {name:<15}{ms:8.3f} ms  {gflop_bwd/ms:7.1f} TF/s',
              flush=True)


def sublayer(m=M, d=D, f=F):
    """Region-level: the full LN->FF->residual sublayer span, XLA bf16 vs
    the one-boundary int8 kernel (as integrated in ViT EncoderBlock)."""
    from sav_tpu.ops.fused_layer import _layernorm
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    b = 192
    x = jax.random.normal(ks[0], (b, m // b, d), jnp.bfloat16)
    params = {
        'scale': jnp.ones((d,), jnp.float32),
        'bias': jnp.zeros((d,), jnp.float32),
        'w1': jax.random.normal(ks[1], (d, f), jnp.float32) / f ** 0.5,
        'b1': jnp.zeros((f,), jnp.float32),
        'w2': jax.random.normal(ks[2], (f, d), jnp.float32) / f ** 0.5,
        'b2': jnp.zeros((d,), jnp.float32),
    }
    gflop = 3 * 2 * (2 * m * d * f) / 1e9

    def xla_span(p, x):
        y2, _, _ = _layernorm(x, p['scale'], p['bias'], 1e-6)
        h = y2 @ p['w1'].astype(x.dtype) + p['b1'].astype(x.dtype)
        return x + jax.nn.gelu(h) @ p['w2'].astype(x.dtype) \
            + p['b2'].astype(x.dtype)

    def int8_span(p, x):
        return int8_ff.int8_ff_sublayer(x, p['scale'], p['bias'],
                                        p['w1'], p['b1'], p['w2'], p['b2'])

    for name, fn in (('xla span', xla_span), ('int8 span', int8_span)):
        # forward only
        ms = _time(lambda x, p: fn(p, x).astype(x.dtype), x, params)
        print(f'fwd  {name:<15}{ms:8.3f} ms', flush=True)
        # fwd + bwd
        loss = lambda p, x: jnp.sum(jnp.square(
            fn(p, x).astype(jnp.float32)))
        grad_fn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(p, x):
            def body(carry, _):
                p, x = carry
                gp, gx = grad_fn(p, x)
                p = jax.tree_util.tree_map(
                    lambda a, g: a - 1e-6 * g.astype(a.dtype), p, gp)
                return (p, x - 1e-6 * gx.astype(x.dtype)), ()
            (p, x), _ = jax.lax.scan(body, (p, x), None, length=STEPS)
            return p

        out = run(params, x)
        float(jnp.sum(out['w1']).astype(jnp.float32))
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            out = run(params, x)
            float(jnp.sum(out['w1']).astype(jnp.float32))
            best = min(best, (time.perf_counter() - start) / STEPS)
        ms = best * 1e3
        print(f'grad {name:<15}{ms:8.3f} ms  {gflop/ms:7.1f} TF/s',
              flush=True)


if __name__ == '__main__':
    if sys.argv[1:2] == ['sublayer']:
        sublayer(*[int(a) for a in sys.argv[2:]])
    else:
        main(*[int(a) for a in sys.argv[1:]])
