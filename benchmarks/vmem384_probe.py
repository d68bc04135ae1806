"""Does a raised scoped-VMEM limit buy anything at ViT-B @384 (L=577)?

Lanes (attention sublayer fwd+bwd, scan-chained, bs=48, bf16):
  flash 208x640    shipped blocks (fwd 3 q-blocks; bwd dq+dkv at 208x320)
  flash 592x640    single-block everywhere, vmem_limit 64 MB
  fused 592x640    whole-forward single kernel + single-block bwd
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

B, L, D, H, HD = 48, 577, 768, 12, 64
STEPS = 20


def lane(core):
    from sav_tpu.ops import fused_layer as fl
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, L, D), jnp.bfloat16)
    p = dict(scale=jnp.ones((D,)), bias=jnp.zeros((D,)),
             wq=jax.random.normal(ks[1], (D, H, HD), jnp.float32) / D ** .5,
             wk=jax.random.normal(ks[2], (D, H, HD), jnp.float32) / D ** .5,
             wv=jax.random.normal(ks[3], (D, H, HD), jnp.float32) / D ** .5,
             wo=jax.random.normal(ks[4], (H, HD, D), jnp.float32) / D ** .5)

    def fn(p, x):
        return fl.attention_sublayer(x, p['scale'], p['bias'], p['wq'],
                                     p['wk'], p['wv'], p['wo'], H, core,
                                     fl.LN_EPS, True, False)

    def loss(p, x):
        return jnp.sum(jnp.square(fn(p, x).astype(jnp.float32)))
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
        return x

    out = run(p, x)
    float(jnp.sum(out).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        out = run(p, x)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - start) / STEPS)
    return best


def main():
    from sav_tpu.ops import flash_attention as fa

    t = lane('flash')
    print(f'flash 208x640 (shipped) {t*1e3:8.3f} ms/layer', flush=True)

    fa._VMEM_LIMIT = 64 * 1024 * 1024
    orig_bs, orig_bwd = fa._block_sizes, fa._bwd_blocks
    fa._block_sizes = lambda q, kv, h, d: (592, 640)
    # whole-array single blocks (the fused fwd pads kv to l_pad=592,
    # NOT 640 — a 640 block there makes num_k=0 and SKIPS the bwd)
    fa._bwd_blocks = lambda qp, kp, bq, bk, h, d: (qp, kp)
    try:
        t = lane('flash')
        print(f'flash 592x640 (raised)  {t*1e3:8.3f} ms/layer', flush=True)
        t = lane('fused')
        print(f'fused 592x640 (raised)  {t*1e3:8.3f} ms/layer', flush=True)
    finally:
        fa._block_sizes, fa._bwd_blocks = orig_bs, orig_bwd
        fa._VMEM_LIMIT = None


if __name__ == '__main__':
    main()
