"""Where does TNT-S's train step go? Lanes (fwd+bwd, scan-chained, bs=64):

  inner layer   SA + FF over [B*196, 16, 24] pixel tokens (x12 in model)
  bridge        inner->outer fold + projection + add  (x12)
  outer layer   SA + FF over [B, 197, 384]            (x12)

The sum x12 against the measured ~125 ms step bounds what an inner-
transformer relayout could recover (ROADMAP round-4 candidate)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

B = 64
P, IL, ID, IH = 196, 16, 24, 4      # patches, inner len/dim/heads
OL, OD, OH = 197, 384, 6            # outer len/dim/heads


def mk(key, *shape):
    return jax.random.normal(key, shape, jnp.bfloat16) * 0.05


def sa_ff(p, x, heads):
    """Pre-LN SA sublayer + FF sublayer (jnp, reference semantics)."""
    d = x.shape[-1]
    hd = d // heads
    ln = lambda a: (a - a.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        a.astype(jnp.float32).var(-1, keepdims=True) + 1e-6).astype(a.dtype)
    y = ln(x)
    q = (y @ p['wq']).reshape(*y.shape[:-1], heads, hd) / jnp.sqrt(
        jnp.asarray(hd, x.dtype))
    k = (y @ p['wk']).reshape(*y.shape[:-1], heads, hd)
    v = (y @ p['wv']).reshape(*y.shape[:-1], heads, hd)
    s = jnp.einsum('...qhc,...phc->...hqp', q, k,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum('...hqp,...phc->...qhc', a, v)
    x = x + o.reshape(*y.shape) @ p['wo']
    y2 = ln(x)
    h = jax.nn.gelu(y2 @ p['w1'])
    return x + h @ p['w2']


def params(key, d, heads):
    ks = jax.random.split(key, 6)
    return {'wq': mk(ks[0], d, d), 'wk': mk(ks[1], d, d),
            'wv': mk(ks[2], d, d), 'wo': mk(ks[3], d, d),
            'w1': mk(ks[4], d, 4 * d), 'w2': mk(ks[5], 4 * d, d)}


def bridge(p, inner, outer):
    flat = inner.reshape(B, P, IL * ID)
    proj = flat @ p['wb']
    return outer.at[:, 1:].add(proj)


def time_lane(name, fn, *args):
    grad_fn = jax.grad(lambda *a: jnp.sum(jnp.square(
        fn(*a).astype(jnp.float32))), argnums=0)

    @jax.jit
    def run(p, x):
        def body(carry, _):
            p, x = carry
            g = grad_fn(p, x)
            p = jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
            return (p, x), ()
        (p, x), _ = jax.lax.scan(body, (args[0], args[1]), None, length=30)
        return x
    out = run(*args)
    float(jnp.sum(out).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / 30)
    print(f'{name:<14}{best*1e3:8.3f} ms/layer  x12 = {best*12e3:6.1f} ms',
          flush=True)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    inner_x = mk(ks[0], B * P, IL, ID)
    outer_x = mk(ks[1], B, OL, OD)
    time_lane('inner layer', lambda p, x: sa_ff(p, x, IH),
              params(ks[2], ID, IH), inner_x)
    time_lane('outer layer', lambda p, x: sa_ff(p, x, OH),
              params(ks[3], OD, OH), outer_x)

    bp = {'wb': mk(jax.random.PRNGKey(9), IL * ID, OD)}
    inner_c = mk(jax.random.PRNGKey(10), B, P, IL * ID)

    def bridge_lane(p, io):
        flat = io.reshape(B, P, IL * ID)
        return flat @ p['wb']
    time_lane('bridge', bridge_lane, bp, inner_c)


if __name__ == '__main__':
    main()
