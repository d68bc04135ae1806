"""ViT-L @384 kernel-regime probe (round-5 queue: TPU worker CRASHED).

At (L=577, h=16, d=64) `_block_sizes` picks the raised single-block
regime (592x640): footprint 34.3 MB passes the 40 MB `_RAISED_CAP`
(tuned at h=12, where @384 measured 11.01 -> 6.72 ms/layer) but the
per-head logit lists alone are 24.2 MB at h=16 and the TPU worker
faults at runtime — the cap's footprint model stops tracking Mosaic's
real stack somewhere between h=12 and h=16.

Lanes (each its own process — a faulted worker wedges the tunnel):

  flashmb  _SINGLE_BLOCK_MAX_L=0: multi-block flash core (160x640
           blocks, the pre-raise @384 regime) — expected safe
  off      use_kernel=False, per-op XLA
  auto     current dispatch (fused 592x640) — CONFIRMS the crash; run
           last, only when deliberately re-testing

Usage: python benchmarks/vitl384_probe.py <flashmb|off|auto> [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

MODE = sys.argv[1] if len(sys.argv) > 1 else 'flashmb'
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
STEPS = 20
MODEL = 'vit_l_patch16'
IMG = 384


def main():
    from sav_tpu.ops import flash_attention as fa
    if MODE == 'flashmb':
        fa._SINGLE_BLOCK_MAX_L = 0      # disable the raised regime
    use_kernel = False if MODE == 'off' else 'auto'

    from sav_tpu.models import create_model
    model = create_model(MODEL, num_classes=1000, dtype=jnp.bfloat16,
                         use_kernel=use_kernel)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, IMG, IMG, 3),
                          jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, 1000)
    v = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(2), x[:1], is_training=False)

    def loss(p):
        logits = model.apply(p, x, is_training=False)
        oh = jax.nn.one_hot(y, 1000)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits.astype(jnp.float32)) * oh, -1))
    g = jax.grad(loss)

    @jax.jit
    def run(p):
        def body(p, _):
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g(p)), ()
        p, _ = jax.lax.scan(body, p, None, length=STEPS)
        return p

    out = run(v)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(v)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      ).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f'{MODEL} @{IMG} bs{BATCH} mode={MODE}: {best*1e3:.2f} ms/step '
          f'{BATCH/best:.1f} img/s', flush=True)


main()
