"""Pallas conv4d kernel: interpret-mode parity vs the XLA path.

Compiled-mode parity + performance are exercised on the real chip by
bench.py / the verify drive (CPU CI runs interpret mode only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patch2pix_tpu.ops.conv4d import conv4d
from patch2pix_tpu.ops.conv4d_pallas import conv4d_pallas


@pytest.mark.parametrize(
    "cin,cout", [(1, 16), (16, 1), (16, 16), (3, 2)]
)
def test_interpret_parity(cin, cout):
    rng = np.random.default_rng(cin * 100 + cout)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 4, 6, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 3, cin, cout)) * 0.1, jnp.float32
    )
    b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    want = np.asarray(conv4d(x, w, b))
    got = np.asarray(conv4d_pallas(x, w, b, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_interpret_parity_asymmetric_dims():
    """h1 != w1 != h2 != w2 exercises every padded-dim bookkeeping."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 3, 5, 6, 4, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 8, 1)) * 0.1, jnp.float32)
    want = np.asarray(conv4d(x, w))
    got = np.asarray(conv4d_pallas(x, w, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
