"""utils.profiling: device timing and trace spans."""

import numpy as np
import jax.numpy as jnp

from pytorch_volumetric_tpu.utils import profiling


def test_device_time_returns_positive_seconds():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)),
                    dtype=jnp.float32)
    dt = profiling.device_time(lambda a: (a @ a).sum(), x, reps=3)
    assert 0 < dt < 5.0


def test_span_sink():
    sink = {}
    with profiling.span("work", sink):
        sum(range(1000))
    assert sink["work"] > 0
