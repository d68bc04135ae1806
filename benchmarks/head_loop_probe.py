"""Probe: does a fori_loop over heads collapse Mosaic's per-head logits
liveness?

The flash kernels unroll the head loop in Python; Mosaic keeps roughly one
live f32 logits tile PER HEAD (measured round 2: 448x512 single-block
demands ~17 MB), which is what forces multi-block execution — and the
online-softmax carry — from L~320 up. If a lax.fori_loop body reuses ONE
logits tile, single-block forwards reach L=577 (ViT-B @384) and the
multi-kv-block carry disappears.

Two sub-questions, measured separately:
  1. COMPILES + fits: single-block L=577 with a head loop (the unrolled
     equivalent fails VMEM sizing).
  2. SPEED: loop vs unroll at a shape where both fit (L=197), since
     unrolling lets Mosaic software-pipeline across heads.

Run one variant per process:
    python benchmarks/head_loop_probe.py {unroll197,loop197,loop577,base577}
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from sav_tpu.ops import flash_attention as fa


def _loop_fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, s_scr, *,
                     kv_len: int, heads: int, d: int):
    """Single-block forward, heads via fori_loop over 128-lane PAIRS.

    Mosaic requires dynamic lane offsets to be provably 128-aligned, so
    the loop strides two d=64 heads at a time; each iteration statically
    splits its 128-lane band. Liveness: two logits tiles per iteration
    (reused across iterations) instead of one per head.
    """
    group = 128 // d          # heads per 128-lane band

    def body(g, carry):
        qg = q_ref[0, :, pl.ds(g * 128, 128)]
        kg = k_ref[0, :, pl.ds(g * 128, 128)]
        vg = v_ref[0, :, pl.ds(g * 128, 128)]
        outs = []
        for j in range(group):
            q = qg[:, j * d:(j + 1) * d]
            k = kg[:, j * d:(j + 1) * d]
            v = vg[:, j * d:(j + 1) * d]
            s = fa._qk(q, k)[:, :kv_len]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            outs.append(fa._matmul(p.astype(v.dtype), v[:kv_len]) / l)
            lse_ref[0, g * group + j] = jnp.broadcast_to(
                m + jnp.log(l), lse_ref.shape[2:])
        out_ref[0, :, pl.ds(g * 128, 128)] = jnp.concatenate(
            outs, axis=1).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, heads // group, body, 0)


def loop_fwd(q, k, v, heads, kv_len):
    batch, l_pad, hd = q.shape
    d = hd // heads
    spec = pl.BlockSpec((1, l_pad, hd), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, heads, l_pad, fa.STAT_LANES),
                            lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_loop_fwd_kernel, kv_len=kv_len, heads=heads, d=d),
        grid=(batch,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, heads, l_pad, fa.STAT_LANES),
                                 jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.float32)],
        interpret=fa._interpret(),
    )(q, k, v)


def _time(fn, *args, iters=20):
    out = fn(*args)            # compile
    jax.block_until_ready(out)
    # forced completion: fetch a scalar that depends on the result
    def chained(x):
        def step(c, _):
            o = fn(*args)
            return c + jnp.sum(o[0][0, 0, :8].astype(jnp.float32)), None
        return jax.lax.scan(step, x, None, length=iters)[0]
    chained_j = jax.jit(chained)
    float(chained_j(jnp.float32(0)))
    t0 = time.perf_counter()
    float(chained_j(jnp.float32(0)))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('variant', choices=['unroll197', 'loop197', 'loop577',
                                       'base577'])
    args = p.parse_args()

    heads, d = 12, 64
    if args.variant in ('unroll197', 'loop197'):
        batch, l = 192, 197
    else:
        batch, l = 48, 577

    rng = jax.random.PRNGKey(0)
    block_q, block_k = fa._block_sizes(l, l, heads, d)
    if args.variant in ('loop197', 'loop577'):
        l_pad = max(fa._round_up(l, 16), 64)
    else:
        l_pad = fa._round_up(l, block_q)
    kv_pad = fa._round_up(l, block_k)

    q = jax.random.normal(rng, (batch, l_pad, heads * d), jnp.bfloat16) * 0.1
    k = jax.random.normal(rng, (batch, kv_pad, heads * d), jnp.bfloat16) * 0.1
    v = jax.random.normal(rng, (batch, kv_pad, heads * d), jnp.bfloat16)

    if args.variant.startswith('loop'):
        fn = jax.jit(lambda a, b, c: loop_fwd(a, b, c, heads, l))
        sec = _time(fn, q[:, :l_pad], k[:, :l_pad], v[:, :l_pad])
    else:
        fn = jax.jit(lambda a, b, c: fa._fwd(
            a, b, c, heads=heads, block_q=block_q, block_k=block_k,
            kv_len=l))
        sec = _time(fn, q, k, v)

    print(json.dumps({'variant': args.variant, 'batch': batch, 'l': l,
                      'ms': round(sec * 1e3, 3),
                      'backend': jax.default_backend()}), flush=True)


if __name__ == '__main__':
    main()
