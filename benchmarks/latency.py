"""Secondary metric: p50 preprocess+forward latency (BASELINE.md).

Measures the serving-shaped path: one decoded uint8 batch -> on-device eval
preprocessing (resize/crop/normalize) -> model forward, end to end in one
jit. Reports p50/p90 over many calls.

Usage: python benchmarks/latency.py [model_name] [batch_size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')

from sav_tpu.data import preprocess
from sav_tpu.models import create_model


def main(model_name='vit_b_patch16', batch_size=8, img=224, raw=256,
         calls=50):
    model = create_model(model_name, num_classes=1000, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        is_training=False)

    @jax.jit
    def serve(variables, raw_images):
        x = jax.vmap(lambda im: preprocess.eval_preprocess(im, img))(
            raw_images.astype(jnp.float32))
        return model.apply(variables, x.astype(jnp.bfloat16),
                           is_training=False)

    raw_images = jax.random.randint(
        jax.random.PRNGKey(1), (batch_size, raw, raw, 3), 0, 256,
        dtype=jnp.int32).astype(jnp.uint8)

    logits = serve(variables, raw_images)
    float(logits[0, 0])   # force completion (async tunnel-safe)

    times = []
    for _ in range(calls):
        start = time.perf_counter()
        logits = serve(variables, raw_images)
        float(logits[0, 0])
        times.append(time.perf_counter() - start)
    times = np.asarray(times) * 1e3
    print({'model': model_name, 'batch': batch_size,
           'p50_ms': round(float(np.percentile(times, 50)), 2),
           'p90_ms': round(float(np.percentile(times, 90)), 2)})


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:2]]))
