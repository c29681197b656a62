"""Fused FAST-score Pallas kernel vs the XLA roll-ladder oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modular_slam_tpu.ops.fast import fast_score
from modular_slam_tpu.ops import fast_pallas as fp

pytestmark = pytest.mark.skipif(not fp._HAVE_PALLAS,
                                reason="pallas unavailable")


def _interp(fn):
    from jax.experimental.pallas import tpu as pltpu

    def run(*a):
        with pltpu.force_tpu_interpret_mode():
            return fn(*a)
    return run


@pytest.mark.parametrize("shape", [(120, 160), (95, 130)])
def test_matches_xla_away_from_border(shape):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    ref = np.asarray(fast_score(img))
    got = np.asarray(_interp(fp._fast_score_impl)(img))
    assert got.shape == ref.shape
    # identical away from the 3-px y-border (x wrap differs only at the
    # 3-px x-border; the detector masks >=19 px anyway)
    b = 3
    np.testing.assert_allclose(got[b:-b, b:-b], ref[b:-b, b:-b],
                               rtol=0, atol=0)


def test_vmap_rule():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (3, 64, 130)).astype(np.float32))
    ref = np.asarray(jax.vmap(fast_score)(imgs))
    f = fp._fast_score_batchable()
    got = np.asarray(_interp(jax.vmap(f))(imgs))
    b = 3
    np.testing.assert_allclose(got[:, b:-b, b:-b], ref[:, b:-b, b:-b],
                               atol=0)
