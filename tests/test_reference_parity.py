"""Scale-dict parity against the reference implementation itself.

The reference qdiff package is loaded from /root/reference (torch CPU,
omegaconf stubbed) and used as a test oracle: identical weights and
activations must produce identical quant params (delta / zero_point /
channel_mask) and identical fake-quant outputs — the 'scale-dict parity'
the driver north-star asks for, checked at the source instead of via
saved artifacts."""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

QDIFF = "/root/reference/ViDiT-Q/quant_utils/qdiff"


class _EasyDict(dict):
    """omegaconf-ish attribute access for the reference's quant configs."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return _EasyDict(v) if isinstance(v, dict) else v


@pytest.fixture(scope="module")
def ref_quant():
    # stub omegaconf (not installed): ListConfig used only in isinstance
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class ListConfig(list):
            pass

        om.ListConfig = ListConfig
        om.OmegaConf = types.SimpleNamespace(create=lambda d: _EasyDict(d))
        sys.modules["omegaconf"] = om

    pkg = types.ModuleType("qdiff")
    pkg.__path__ = [QDIFF]
    sys.modules["qdiff"] = pkg
    base = types.ModuleType("qdiff.base")
    base.__path__ = [f"{QDIFF}/base"]
    sys.modules["qdiff.base"] = base

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    bq = load("qdiff.base.base_quantizer", f"{QDIFF}/base/base_quantizer.py")
    load("qdiff.base.mixed_precision_quantizer",
         f"{QDIFF}/base/mixed_precision_quantizer.py")
    ql = load("qdiff.base.quant_layer", f"{QDIFF}/base/quant_layer.py")
    sq = load("qdiff.smooth_quant.sq_quant_layer",
              f"{QDIFF}/smooth_quant/sq_quant_layer.py")
    return types.SimpleNamespace(bq=bq, ql=ql, sq=sq)


@pytest.mark.parametrize("sym", [True, False])
def test_static_weight_quantizer_scale_dict_parity(ref_quant, rng, sym):
    """delta / zero_point / fake-quant weight parity vs StaticQuantizer."""
    from wanq_tpu.quant.quantizers import QuantizerCfg, weight_fake_quant, weight_quant_params

    w = rng.normal(size=(24, 48)).astype(np.float32)  # torch [C_out, C_in]
    q = ref_quant.bq.StaticQuantizer({"n_bits": 8, "sym": sym})
    with torch.no_grad():
        # avoid the .to('cuda') in the sym running-update path
        if sym:
            t = torch.tensor(w)
            absmax = t.abs().max(dim=1)[0]
            delta_ref = (absmax / q.n_levels).unsqueeze(-1).numpy()
            zp_ref = np.zeros_like(delta_ref)
            q.delta = torch.tensor(delta_ref)
            q.zero_point = torch.tensor(zp_ref)
            q.init_done = True
            wq_ref = q(torch.tensor(w)).numpy()
        else:
            wq_ref = q(torch.tensor(w)).numpy()
            delta_ref = q.delta.numpy()
            zp_ref = q.zero_point.numpy()

    cfg = QuantizerCfg(n_bits=8, sym=sym)
    d, z = weight_quant_params(jnp.asarray(w.T), cfg)  # ours: [C_in, C_out]
    np.testing.assert_allclose(np.asarray(d), delta_ref[:, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z), zp_ref[:, 0], rtol=1e-6)
    wq = np.asarray(weight_fake_quant(jnp.asarray(w.T), cfg)).T
    np.testing.assert_allclose(wq, wq_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("sym", [True, False])
def test_dynamic_act_quantizer_parity(ref_quant, rng, sym):
    from wanq_tpu.quant.quantizers import QuantizerCfg, dynamic_fake_quant

    x = rng.normal(size=(32, 64)).astype(np.float32) * 3
    q = ref_quant.bq.DynamicQuantizer({"n_bits": 8, "sym": sym})
    q.module_name = "test"
    with torch.no_grad():
        want = q(torch.tensor(x)).numpy()
    got = np.asarray(dynamic_fake_quant(jnp.asarray(x), QuantizerCfg(8, sym)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("sym", [True, False])
def test_static_act_quantizer_running_minmax_parity(ref_quant, rng, sym):
    """merge_minmax + params_from_minmax vs the reference StaticQuantizer's
    running accumulation over two calibration batches
    (base_quantizer.py:74-87) — the static-A8 math (VERDICT missing #7)."""
    from wanq_tpu.quant.quantizers import (
        QuantizerCfg, merge_minmax, params_from_minmax,
    )

    x1 = (rng.normal(size=(16, 64)) * 2).astype(np.float32)
    x2 = (rng.normal(size=(16, 64)) * 5).astype(np.float32)
    q = ref_quant.bq.StaticQuantizer({"n_bits": 8, "sym": sym})
    with torch.no_grad():
        if sym:
            # reimplement the two-batch sym accumulation (the reference's
            # update path hard-codes .to('cuda'))
            absmax = torch.maximum(
                torch.tensor(x1).abs().max(dim=1)[0],
                torch.tensor(x2).abs().max(dim=1)[0],
            )
            delta_ref = (absmax / q.n_levels).unsqueeze(-1).numpy()
            zp_ref = np.zeros_like(delta_ref)
        else:
            q.init_quant_params(torch.tensor(x1))
            q.init_quant_params(torch.tensor(x2))
            delta_ref = q.delta.numpy()
            zp_ref = q.zero_point.numpy()

    acc = merge_minmax(None, jnp.asarray(x1))
    acc = merge_minmax(acc, jnp.asarray(x2))
    d, z = params_from_minmax(acc[0], acc[1], QuantizerCfg(8, sym))
    np.testing.assert_allclose(np.asarray(d), delta_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(z), zp_ref, rtol=1e-6, atol=1e-8)


def test_quantized_linear_forward_parity(ref_quant, rng):
    """Full QuantizedLinear forward vs our sim qlinear on identical
    weights/inputs (the Wan W8 asym / A8 sym config)."""
    from wanq_tpu.quant.config import LayerPolicy
    from wanq_tpu.quant.qlinear import QuantCtx, qlinear
    from wanq_tpu.quant.quantizers import QuantizerCfg
    from wanq_tpu.quant.ptq import prepare_layer_state

    c_in, c_out = 48, 32
    # pin torch's GLOBAL rng: other test files consume it, and an
    # order-dependent weight draw can cross the tight rtol here
    torch.manual_seed(42)
    lin = torch.nn.Linear(c_in, c_out)
    x = rng.normal(size=(2, 10, c_in)).astype(np.float32)

    qcfg = _EasyDict({"weight": {"n_bits": 8, "sym": False},
                      "act": {"n_bits": 8, "sym": True}})
    ref_layer = ref_quant.ql.QuantizedLinear(
        c_in, c_out, True, torch.device("cpu"), qcfg, lin
    )
    for quantizer in (ref_layer.a_quantizer,):
        quantizer.module_name = "t"
    with torch.no_grad():
        want = ref_layer(torch.tensor(x)).numpy()

    w_ours = jnp.asarray(lin.weight.detach().numpy().T)
    policy = LayerPolicy(method="base", weight=QuantizerCfg(8, False),
                         act=QuantizerCfg(8, True))
    st = prepare_layer_state(policy, w_ours, None, None)
    ctx = QuantCtx(mode="sim", policies={"l": policy}, state={"l": st})
    params = {"w": w_ours, "b": jnp.asarray(lin.bias.detach().numpy())}
    got = np.asarray(qlinear(ctx, "l", params, jnp.asarray(x), jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smooth_quant_channel_mask_and_forward_parity(ref_quant, rng):
    """SQQuantizedLinear: channel mask + scaled-weight quant + forward."""
    from wanq_tpu.quant.config import LayerPolicy
    from wanq_tpu.quant.qlinear import QuantCtx, qlinear
    from wanq_tpu.quant.quantizers import QuantizerCfg
    from wanq_tpu.quant.ptq import prepare_layer_state

    c_in, c_out = 48, 32
    torch.manual_seed(42)  # see test_quantized_linear_forward_parity
    lin = torch.nn.Linear(c_in, c_out)
    x = rng.normal(size=(1, 12, c_in)).astype(np.float32)
    act_mask = (np.abs(rng.normal(size=(c_in,))) + 0.1).astype(np.float32)
    alpha = 0.5665

    qcfg = _EasyDict({"weight": {"n_bits": 8, "sym": False},
                      "act": {"n_bits": 8, "sym": True},
                      "smooth_quant": {"alpha": alpha}})
    ref_layer = ref_quant.sq.SQQuantizedLinear(
        c_in, c_out, True, torch.device("cpu"), qcfg, lin
    )
    ref_layer.a_quantizer.module_name = "t"
    with torch.no_grad():
        ref_layer.get_channel_mask(torch.tensor(act_mask))
        ref_layer.update_quantized_weight_scaled()
        want = ref_layer(torch.tensor(x)).numpy()
        mask_ref = ref_layer.channel_mask.numpy()

    w_ours = jnp.asarray(lin.weight.detach().numpy().T)
    policy = LayerPolicy(method="smooth_quant", weight=QuantizerCfg(8, False),
                         act=QuantizerCfg(8, True), alpha=alpha)
    st = prepare_layer_state(policy, w_ours, act_mask, None)
    np.testing.assert_allclose(np.asarray(st["channel_mask"]), mask_ref,
                               rtol=1e-5)
    ctx = QuantCtx(mode="sim", policies={"l": policy}, state={"l": st})
    params = {"w": w_ours, "b": jnp.asarray(lin.bias.detach().numpy())}
    got = np.asarray(qlinear(ctx, "l", params, jnp.asarray(x), jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reference_quant_params_artifact_import(ref_quant, rng, tmp_path):
    """quant_params.pth import: a reference-format quant_param_dict (the
    exact save schema of save_quant_param_dict_, quant_model.py:161-174,
    built from the reference's own quantizer modules) loads into our
    scale-dict schema and matches prepare_layer_state on identical
    weights — the north-star's 'scale-dict parity against reference PTQ
    artifacts' checked on the artifact itself."""
    from wanq_tpu.quant.config import LayerPolicy
    from wanq_tpu.quant.ptq import (
        compare_scale_dicts,
        load_reference_quant_params,
        prepare_layer_state,
    )
    from wanq_tpu.quant.quantizers import QuantizerCfg

    c_in, c_out = 48, 32
    w = rng.normal(size=(c_out, c_in)).astype(np.float32)  # torch layout
    act_mask = (np.abs(rng.normal(size=(c_in,))) + 0.1).astype(np.float32)
    alpha = 0.5665

    # --- reference side: SQQuantizedLinear scales the weight by the
    # channel mask, then its w_quantizer holds the per-channel grid
    lin = torch.nn.Linear(c_in, c_out)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(w))
    qcfg = _EasyDict({"weight": {"n_bits": 8, "sym": False},
                      "act": {"n_bits": 8, "sym": True},
                      "smooth_quant": {"alpha": alpha}})
    ref_layer = ref_quant.sq.SQQuantizedLinear(
        c_in, c_out, True, torch.device("cpu"), qcfg, lin
    )
    ref_layer.a_quantizer.module_name = "t"
    with torch.no_grad():
        ref_layer.get_channel_mask(torch.tensor(act_mask))
        ref_layer.update_quantized_weight_scaled()
    artifact = {
        "blocks.0.ffn.0.w_quantizer": {
            "delta": ref_layer.w_quantizer.delta,
            "zero_point": ref_layer.w_quantizer.zero_point,
            "channel_mask": ref_layer.channel_mask,
        },
        # per-tensor static act entry (frozen StaticQuantizer scale)
        "blocks.0.ffn.2.a_quantizer": {
            "delta": torch.tensor([0.123]),
            "zero_point": torch.tensor([0.0]),
        },
        # dynamic act entry (transient per-call grid): must be skipped
        "blocks.0.ffn.0.a_quantizer": {
            "delta": torch.ones(12, 1),
            "zero_point": torch.zeros(12, 1),
        },
    }
    path = tmp_path / "quant_params.pth"
    torch.save(artifact, str(path))

    imported = load_reference_quant_params(str(path))
    assert set(imported) == {"blocks.0.ffn.0", "blocks.0.ffn.2"}
    assert "delta_a" not in imported["blocks.0.ffn.0"]  # dynamic skipped
    np.testing.assert_allclose(
        imported["blocks.0.ffn.2"]["delta_a"], [0.123]
    )

    # --- our side: same weight through prepare_layer_state
    policy = LayerPolicy(method="smooth_quant", weight=QuantizerCfg(8, False),
                         act=QuantizerCfg(8, True), alpha=alpha)
    st = prepare_layer_state(policy, jnp.asarray(w.T), act_mask, None)
    report = compare_scale_dicts(
        {"blocks.0.ffn.0": st}, imported, rtol=1e-3
    )
    errs = report["layers"]["blocks.0.ffn.0"]
    assert set(errs) == {"delta_w", "zp_w", "channel_mask"}
    assert report["pass"], report
