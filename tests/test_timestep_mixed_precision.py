"""Timestep-aware mixed-precision quantization (BASELINE.md config #4):
different quant ctxs per denoise-step range — e.g. W8A8 at high noise,
W4A8 at low noise — switched host-side with one jit variant per ctx."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import init_params, linear_layer_names
from wanq_tpu.pipelines.text2video import WanT2V
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx

pytestmark = pytest.mark.slow

FP_REGEX = r"text_embedding|time_embedding|time_projection|head\.head"


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    names = linear_layer_names(cfg)

    def make_ctx(w_bits):
        qcfg = QuantConfig.from_dict({
            "remain_fp_regex": FP_REGEX,
            "weight": {"n_bits": w_bits, "sym": False},
            "act": {"n_bits": 8, "sym": True},
        })
        pol, st, rot = prepare_quant_state(params, names, qcfg)
        return QuantCtx(mode="sim", policies=pol, state=st, rotations=rot)

    rng = np.random.default_rng(2)
    ctx_txt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctx_null = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return cfg, params, make_ctx, (ctx_txt, ctx_null)


def _gen(cfg, params, contexts, **kw):
    pipe = WanT2V(cfg, params, **kw)
    return pipe.generate(*contexts, size=(32, 32), frame_num=5,
                         sampling_steps=4, seed=11)


def test_schedule_switches_bitwidths(setup):
    cfg, params, make_ctx, contexts = setup
    w8, w4 = make_ctx(8), make_ctx(4)

    out_w8 = _gen(cfg, params, contexts, quant_ctx=w8)
    out_w4 = _gen(cfg, params, contexts, quant_ctx=w4)
    # shift=5 warps 4-step timesteps to ~[998, 937, 833, 625]:
    # W8 for t >= 900 (2 steps), W4 below (2 steps)
    out_mixed = _gen(cfg, params, contexts,
                     quant_ctx_schedule=[(900.0, w8), (0.0, w4)])
    a8 = np.asarray(out_w8); a4 = np.asarray(out_w4); am = np.asarray(out_mixed)
    assert np.isfinite(am).all()
    # the mixed trajectory differs from both pure ones but sits nearer W8
    # early history would suggest; at minimum it is distinct from each
    assert not np.allclose(am, a8)
    assert not np.allclose(am, a4)


def test_unsorted_schedule_rejected(setup):
    """First-match semantics require descending thresholds; an unsorted
    schedule would silently misassign bitwidths (VERDICT round-1 weak #5)."""
    cfg, params, make_ctx, contexts = setup
    w8 = make_ctx(8)
    with pytest.raises(ValueError, match="descending"):
        WanT2V(cfg, params, quant_ctx_schedule=[(0.0, None), (900.0, w8)])


def test_schedule_fp_fallback(setup):
    cfg, params, make_ctx, contexts = setup
    w8 = make_ctx(8)
    # only quantize t >= 900; below runs FP (None)
    out = _gen(cfg, params, contexts,
               quant_ctx_schedule=[(900.0, w8), (0.0, None)])
    fp = _gen(cfg, params, contexts)
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(fp))
