"""Block rematerialization for training (jax.checkpoint): identical loss
and gradients with and without remat, on both the list and scan param
layouts — the TPU activation-memory trade for 14B-scale training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import dit_forward, init_params, stack_block_params

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t = jnp.asarray([400.0])
    txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return cfg, params, (x0, noise, t, txt)


def _loss_fn(cfg, remat):
    def loss(p, x0, noise, t, c):
        sigma = (t / 1000.0)[:, None, None, None, None]
        xt = (1.0 - sigma) * x0 + sigma * noise
        v = dit_forward(p, cfg, xt, t, c, 32, remat=remat)
        return jnp.mean(jnp.square(v - (noise - x0)))

    return loss


@pytest.mark.parametrize("stacked", [False, True], ids=["list", "scan"])
def test_remat_grads_match(setup, stacked):
    cfg, params, batch = setup
    p = stack_block_params(params) if stacked else params
    g_plain = jax.jit(jax.value_and_grad(_loss_fn(cfg, False)))(p, *batch)
    g_remat = jax.jit(jax.value_and_grad(_loss_fn(cfg, True)))(p, *batch)
    np.testing.assert_allclose(float(g_plain[0]), float(g_remat[0]), rtol=1e-6)
    flat_a = jax.tree.leaves(g_plain[1])
    flat_b = jax.tree.leaves(g_remat[1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
