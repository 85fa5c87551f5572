"""PTQ driver: weights + calibration stats → quant-state pytree.

TPU-native rebuild of ptq_wanx.py:261-385 and the weight-update methods of
the quant layers (quant_layer.py:40-41, sq_quant_layer.py:27-44,
quarot_quant_layer.py:27-45, viditq_quant_layer.py:30-50) plus the INT8
export (quant_wanx.py:137-185, quant_wanx_cuda.py:39-56).

The reference mutates module buffers; here `prepare_quant_state` is a pure
host-side function returning

    state:      {layer_path: {w_q, delta_w, zp_w, channel_mask?, w_int8,
                              scale_w, zp_w_int}}
    rotations:  {in_features: f32 orthonormal matrix}

which the functional model consumes via QuantCtx. Rotation matrices are
seeded (PTQ and inference provably share Q — the reference regenerates an
unseeded Q on load, quant_model.py:145) and the weight-side rotation runs
in host float64 (TPUs have no f64; see hadamard.py docstring).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.quant.config import LayerPolicy, QuantConfig
from wanq_tpu.quant.hadamard import (
    derived_rotation_seed,
    rotate_weight_fwht,
    rotation_for_dim,
)
from wanq_tpu.quant.quantizers import (
    pack_int4,
    weight_fake_quant,
    weight_int_quant,
    weight_quant_params,
)
from wanq_tpu.quant.smooth import channel_mask

Params = Dict[str, Any]


def params_get(params: Params, path: str):
    """Navigate a params pytree by dotted reference-style path."""
    node = params
    for part in path.split("."):
        if isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def reduce_calib(calib: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """[T, C] per-call absmax stacks → per-channel max over timesteps,
    clamped ≥ 1e-3 (ref ptq_wanx.py:336-341). ``.act_min`` entries reduce
    with min and skip the clamp (static-A8 running-min accumulation,
    ref StaticQuantizer, base_quantizer.py:74-87)."""
    out = {}
    for name, arr in calib.items():
        if name.endswith(".hess"):
            # input Hessians: [C, C] already summed over the sweep
            # (pipelines accumulate instead of stacking), or a stacked
            # [T, C, C] from a caller that kept per-step terms — sum those.
            # Kept as-is (possibly a device-resident jax array) so the
            # GPTQ solve never round-trips hundreds of MB through host
            out[name] = arr.sum(axis=0) if getattr(arr, "ndim", 0) == 3 else arr
            continue
        a = np.asarray(arr, dtype=np.float32)
        if name.endswith(".act_min"):
            out[name] = a.min(axis=0) if a.ndim == 2 else a
        elif name.endswith(".act_max"):
            out[name] = a.max(axis=0) if a.ndim == 2 else a
        elif ".attn_" in name:
            # attention captures (attn_q/k/v absmax [T,H,D]; attn_map
            # pooled softmax maps [T,H,Sp,Sp]): reduce over the sweep but
            # NO 1e-3 clamp — softmax probabilities at long S live far
            # below it, and the clamp exists for smooth-quant denominators
            out[name] = a.max(axis=0) if a.ndim >= 2 else a
        else:
            if a.ndim == 2:
                a = a.max(axis=0)
            out[name] = np.maximum(a, 1e-3)
    return out


def prepare_layer_state(
    policy: LayerPolicy,
    w: jax.Array,
    act_absmax: Optional[np.ndarray],
    rotation_seed: Optional[int],
    targets: str = "both",
    rotate_on_device: bool = False,
    act_minmax: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    hessian: Optional[jax.Array] = None,
    act_rotation: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Quant state for one layer. w: [C_in, C_out] (f32).

    Method semantics (weight side):
      base    w_q = FQ(w)                       (quant_layer.py:40-41)
      sq      w_q = FQ(w / mask)                (sq_quant_layer.py:36-44)
      quarot  w_q = FQ(rot(w))                  (quarot_quant_layer.py:30-45)
      viditq  w_q = FQ(rot(FQ(w / mask)))       (viditq_quant_layer.py:40-50;
              the double fake-quant is the reference's exact behavior)
    """
    wcfg = policy.weight
    assert wcfg is not None
    st: Dict[str, jax.Array] = {}

    wf = w.astype(jnp.float32)  # stays on device unless rotation needs f64
    if policy.uses_channel_mask:
        assert act_absmax is not None, "smooth_quant/viditq need calibration data"
        mask = channel_mask(wf, jnp.asarray(act_absmax), policy.alpha)
        st["channel_mask"] = mask
        wf = wf / mask[:, None]

    if policy.method == "viditq":
        # first fake-quant of the scaled weight (viditq_quant_layer.py:47)
        wf = weight_fake_quant(wf, wcfg)

    if policy.uses_rotation:
        assert rotation_seed is not None
        if rotate_on_device:
            # sharded-PTQ path (14B under FSDP, ref ptq_wanx.py:364-368):
            # the FWHT runs in f32 on the mesh — per-column along C_in, so
            # it parallelizes over the fsdp-sharded C_out without gathers.
            # f32-vs-f64 rotation error is benign (tests/test_hadamard.py)
            from wanq_tpu.quant.hadamard import matmul_hadU, rotation_signs

            s = jnp.asarray(rotation_signs(int(wf.shape[0]), rotation_seed),
                            jnp.float32)
            wf = matmul_hadU((s[:, None] * wf).T).T
        else:
            # x @ Q rotated activations pair with Q^T @ w weights; the weight
            # side runs as a host-f64 FWHT — O(n log n) per column instead of
            # the dense O(n^2) matmul the reference does
            # (quarot_quant_layer.py:41), which would take hours at 14B dims
            wf = jnp.asarray(
                rotate_weight_fwht(np.asarray(wf), rotation_seed).astype(np.float32)
            )

    w_work = wf

    if policy.lowrank > 0:
        # SVDQuant-style low-rank outlier branch (quant/svd.py,
        # arXiv:2411.05007): split the TRANSFORMED weight — the branch
        # must live in the same input space as the quantized GEMM, and
        # after channel-mask migration the weight side holds the outliers
        # the dominant singular directions absorb. Only the residual is
        # quantized below; qlinear re-adds (xf @ L1) @ L2 at apply time.
        from wanq_tpu.quant.svd import lowrank_split

        l1, l2, w_work = lowrank_split(w_work, policy.lowrank)
        st["lowrank_a"] = l1.astype(jnp.bfloat16)
        st["lowrank_b"] = l2.astype(jnp.bfloat16)

    if policy.is_w4a4:
        # Atom-style W4A4 (ref csrc/qgemm/w4a4/atom.cu): symmetric int4
        # group quant along K for BOTH weight and activation; one scale
        # per (K-group, out-channel). Orthogonal to the per-output-channel
        # grid below — the per-group scales ride their own state entries
        # (w_int4g packed codes + scale_wg [G, C_out]) and the activation
        # side quantizes dynamically per (token, group) inside qlinear.
        if policy.gptq:
            raise ValueError(
                "GPTQ rounding operates on the per-output-channel grid; "
                "the W4A4 route quantizes per K-group — combine is not "
                "implemented (the reference's atom.cu is plain RTN too)"
            )
        if not policy.act.dynamic:
            raise ValueError("W4A4 activations quantize per (token, group) "
                             "dynamically; static A4 is not supported")
        from wanq_tpu.quant.quantizers import weight_group_int4_quant

        g = policy.group
        if int(w_work.shape[0]) % g:
            raise ValueError(
                f"W4A4 group size {g} must divide in_features "
                f"{int(w_work.shape[0])}; set act.group in the quant YAML "
                "to a common divisor of every quantized layer's input dim "
                "(all production Wan dims are multiples of 128)"
            )
        codes4, scale_g = weight_group_int4_quant(w_work, g)
        if targets in ("sim", "both"):
            k, n = w_work.shape
            st["w_q"] = (
                codes4.astype(jnp.float32).reshape(k // g, g, n)
                * scale_g[:, None, :]
            ).reshape(k, n)
        if targets in ("int8", "both"):
            st["w_int4g"] = pack_int4(codes4)
            st["scale_wg"] = scale_g
        return st

    if policy.gptq and hessian is not None:
        # Hessian-aware rounding (quant/gptq.py): same per-output-channel
        # grid and code convention as the RTN path below — the produced
        # state is a drop-in for sim / int8 / packed-int4 deployment.
        from wanq_tpu.quant.gptq import gptq_quantize, transform_hessian

        hq = transform_hessian(
            jnp.asarray(hessian, jnp.float32),
            channel_mask=st.get("channel_mask"),
            act_rotation=act_rotation,
        )
        w_gq, codes, d, z = gptq_quantize(
            w_work, hq, wcfg, act_order=policy.gptq_act_order
        )
        if targets in ("sim", "both"):
            st["w_q"] = w_gq
    else:
        codes = None
        if targets in ("sim", "both"):
            st["w_q"] = weight_fake_quant(w_work, wcfg)
        d, z = weight_quant_params(w_work, wcfg)
    st["delta_w"] = d
    st["zp_w"] = z
    if wcfg.active_bits in (4, 8) and targets in ("int8", "both"):
        if codes is None:
            codes, d, z = weight_int_quant(w_work, wcfg)
        if wcfg.active_bits == 4 and codes.shape[0] % 2 == 0:
            # true 4-bit storage: two int4 per byte along K — 0.5x the int8
            # container bytes in HBM (ref packed weights,
            # csrc/qgemm/w4a8/w4a8_per_channel_gemm_cuda_qserve.cu)
            st["w_int4"] = pack_int4(codes)
        else:
            st["w_int8"] = codes
        st["scale_w"] = d
        st["zp_w_int"] = z

    _finish_static_act(st, policy, act_minmax)
    return st


def _finish_static_act(
    st: Dict[str, jax.Array],
    policy: LayerPolicy,
    act_minmax: Optional[Tuple[np.ndarray, np.ndarray]],
) -> None:
    if policy.act is None or policy.act.dynamic:
        return
    # static A8: per-tensor params frozen from the calibration sweep's
    # running min/max (ref StaticQuantizer; our deployment group is
    # per-tensor — the reference's group='tensor' configuration)
    if policy.uses_channel_mask or policy.uses_rotation:
        raise ValueError(
            "static activation quant cannot combine with "
            f"{policy.method}: calibration min/max are collected on the "
            "raw input but the mask/rotation transforms the activation "
            "before quantization — the frozen scales would be wrong. "
            "Use dynamic act quant with this method (the reference "
            "does the same)."
        )
    assert act_minmax is not None, (
        "static act quant needs calibration min/max (run get_calib_data "
        "with --collect_minmax)"
    )
    from wanq_tpu.quant.quantizers import params_from_minmax

    amax, amin = act_minmax
    x_max = jnp.asarray([np.maximum(np.max(amax), 0.0)], jnp.float32)
    x_min = jnp.asarray([np.minimum(np.min(amin), 0.0)], jnp.float32)
    d_a, zp_a = params_from_minmax(x_max, x_min, policy.act)
    st["delta_a"] = d_a[:, 0]
    st["zp_a"] = zp_a[:, 0]


def quant_state_shardings(
    mesh, state: Dict[str, Dict[str, jax.Array]], full_shard: bool = False
):
    """NamedSharding pytree for a quant-state dict: per-output-channel
    entries follow the FSDP weight split (w_*: [C_in(|/2), C_out] on the
    C_out dim; scale/zp vectors on theirs), per-input entries replicate.
    ``full_shard`` stores over every non-dp axis, matching
    parallel.sharding.storage_axes — a --full_shard deployment then places
    int8 weight state exactly as the AOT capacity planner models it.
    The 14B int8 weights (~14 GB) must live sharded on the mesh
    (VERDICT round-1 missing #6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wanq_tpu.parallel.sharding import storage_axes

    axes, fs = storage_axes(mesh, full_shard)

    def spec(key, leaf):
        if key in ("w_q", "w_int8", "w_int4", "w_int4g", "scale_wg") and (
            leaf.shape[-1] % fs == 0
        ):
            # all 2D with C_out last: weight matrices and the W4A4
            # per-(K-group, C_out) scale plane split on the output dim
            return NamedSharding(mesh, P(None, axes))
        if key in ("delta_w", "zp_w", "scale_w", "zp_w_int") and (
            leaf.shape and leaf.shape[0] % fs == 0
        ):
            return NamedSharding(mesh, P(axes))
        return NamedSharding(mesh, P())  # channel_mask etc: per-C_in, replicated

    return {
        name: {k: spec(k, v) for k, v in st.items()} for name, st in state.items()
    }


def shard_quant_state(state, mesh, full_shard: bool = False):
    """Place a quant-state dict onto the mesh (one-time, after PTQ)."""
    shardings = quant_state_shardings(mesh, state, full_shard)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def scan_state_sharding_for(mesh, key: str, leaf, full_shard: bool = False):
    """NamedSharding for one STACKED per-block quant-state leaf [L, ...]
    (stack_quant_state layout): weight matrices split on their output dim
    over the storage axes, per-C_out vectors on theirs, rest replicated.
    Shared by the AOT validator and the runtime mesh deployment so the
    executed layout is exactly the one the capacity planner models."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wanq_tpu.parallel.sharding import storage_axes

    axes, fs = storage_axes(mesh, full_shard)
    if key in ("w_q", "w_int8", "w_int4", "w_int4g", "scale_wg") and (
        leaf.shape[-1] % fs == 0
    ):
        return NamedSharding(mesh, P(None, None, axes))
    if key in ("delta_w", "zp_w", "scale_w", "zp_w_int") and (
        len(leaf.shape) >= 2 and leaf.shape[1] % fs == 0
    ):
        return NamedSharding(mesh, P(None, axes))
    return NamedSharding(mesh, P())


def shard_scan_ctx(ctx, mesh, full_shard: bool = False):
    """Place a scan-form QuantCtx's state onto the mesh: the stacked
    per-block entries FSDP-sharded (scan_state_sharding_for), the non-block
    entries per quant_state_shardings. Returns a new QuantCtx."""
    from wanq_tpu.quant.qlinear import QuantCtx

    assert ctx.scan_state is not None, "build with models.dit.make_scan_ctx first"
    scan_shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: scan_state_sharding_for(
            mesh, str(getattr(path[-1], "key", "")), leaf, full_shard
        ),
        ctx.scan_state,
    )
    new = QuantCtx(
        mode=ctx.mode, policies=ctx.policies,
        state=shard_quant_state(ctx.state, mesh, full_shard),
        rotations=jax.tree.map(
            lambda r: jax.device_put(
                r, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            ),
            ctx.rotations,
        ),
        attn=ctx.attn, cross_attn=ctx.cross_attn,
        collect_minmax=ctx.collect_minmax, attn_map_pool=ctx.attn_map_pool,
    )
    new.scan_state = jax.tree_util.tree_map(
        jax.device_put, ctx.scan_state, scan_shardings
    )
    new.attn_perms = ctx.attn_perms
    return new


def prepare_quant_state(
    params: Params,
    layer_names,
    qcfg: QuantConfig,
    calib: Optional[Mapping[str, np.ndarray]] = None,
    seed: int = 0,
    targets: str = "both",
    mesh=None,
    full_shard: bool = False,
    rotate_on_device: Optional[bool] = None,
) -> Tuple[Dict[str, LayerPolicy], Dict[str, Dict[str, jax.Array]], Dict[int, jax.Array]]:
    """Full-model PTQ (ref ptq_wanx.py generate() :261-385).

    ``targets``: which deployed weights to materialize — 'sim' (fake-quant
    bf16), 'int8' (true int8 + export params), or 'both'.
    ``mesh``: sharded PTQ (ref runs PTQ under FSDP, ptq_wanx.py:364-368) —
    weights stay on the mesh end to end (rotations run on-device in f32,
    never pulled to host) and every state entry lands FSDP-sharded;
    ``full_shard`` stores it over every non-dp axis (matches
    parallel.sharding.storage_axes).
    ``rotate_on_device``: force the f32 on-device FWHT for weight
    rotations (default: only when ``mesh`` is given). Single-chip PTQ at
    real dims wants this too — the host-f64 route pulls each weight over
    the device link (f32-vs-f64 FWHT error is benign, tests/test_hadamard.py).
    Returns (policies, state, rotations)."""
    if rotate_on_device is None:
        rotate_on_device = mesh is not None
    policies = {name: qcfg.resolve(name) for name in layer_names}
    calib_max = reduce_calib(calib) if calib is not None else {}

    rot_dims = set()
    rot_cache: Dict[int, jax.Array] = {}
    state: Dict[str, Dict[str, jax.Array]] = {}
    for name, policy in policies.items():
        if not policy.is_quantized:
            continue
        w = params_get(params, name)["w"].astype(jnp.float32)
        state[name] = _layer_state(
            policy, name, w, calib_max, seed, targets, rotate_on_device,
            rot_dims, rot_cache=rot_cache,
        )

    if mesh is not None:
        state = shard_quant_state(state, mesh, full_shard)

    # activation-side rotations stay dense f32 matrices (they ride the MXU
    # inside the forward); regenerated from the same seeds
    rotations = {
        d: jnp.asarray(rotation_for_dim(d, seed=seed).astype(np.float32))
        for d in rot_dims
    }
    return policies, state, rotations


def _layer_state(policy, name, w, calib_max, seed, targets,
                 rotate_on_device, rot_dims, rot_cache=None):
    """One layer's quant state (shared by the list-form and stacked PTQ
    drivers — keeps their calibration-key/GPTQ/rotation handling from
    drifting). ``rot_dims`` collects the activation-rotation dims the
    caller turns into the runtime ``rotations`` dict. ``rot_cache``
    (dict, per prepare call) memoizes the dense GPTQ act-rotation by
    input dim — same-(dim, seed) layers share one host FWHT build +
    device transfer instead of rebuilding per layer."""
    rot_seed = None
    if policy.uses_rotation:
        c_in = int(w.shape[0])
        rot_dims.add(c_in)
        rot_seed = derived_rotation_seed(c_in, seed)
    act_absmax = calib_max.get(name)
    if policy.uses_channel_mask and act_absmax is None:
        raise ValueError(
            f"layer {name} uses {policy.method} but no calibration data "
            f"was provided (expected key '{name}')"
        )
    act_minmax = None
    if f"{name}.act_max" in calib_max:
        act_minmax = (calib_max[f"{name}.act_max"],
                      calib_max[f"{name}.act_min"])
    hessian = act_rotation = None
    if policy.gptq:
        # Hessian-aware rounding when the calibration sweep collected
        # this layer's input Hessian (hessian_regex); RTN otherwise —
        # the regex may intentionally cover a subset of layers
        hessian = calib_max.get(f"{name}.hess")
        if hessian is not None and policy.uses_rotation:
            # the Hessian transform needs the activation-side rotation
            # (x @ Q pairs with the FWHT'd weight; same matrix as the
            # runtime `rotations` dict the caller builds)
            c_in = int(w.shape[0])
            if rot_cache is not None and c_in in rot_cache:
                act_rotation = rot_cache[c_in]
            else:
                act_rotation = jnp.asarray(
                    rotation_for_dim(c_in, seed=seed).astype(np.float32)
                )
                if rot_cache is not None:
                    rot_cache[c_in] = act_rotation
    return prepare_layer_state(
        policy, w, act_absmax, rot_seed, targets,
        rotate_on_device=rotate_on_device,
        act_minmax=act_minmax,
        hessian=hessian,
        act_rotation=act_rotation,
    )


def prepare_quant_state_stacked(
    stacked_blocks,
    num_layers: int,
    qcfg: QuantConfig,
    calib: Optional[Mapping[str, np.ndarray]] = None,
    seed: int = 0,
    targets: str = "sim",
) -> Tuple[Dict[str, LayerPolicy], Dict[str, Dict[str, jax.Array]], Dict[int, jax.Array]]:
    """Memory-lean PTQ for models already in scan (stacked-block) form.

    ``prepare_quant_state`` + ``make_scan_ctx`` need three weight-sized
    residents at peak: list-form params, the per-layer state dicts, and
    the stacked copies mid-``jnp.stack``. For sim deployments (state
    carries a full fake-quant ``w_q`` per layer) at 1.3B+ that OOMs a
    16 GiB chip next to the forward params. This variant slices each
    layer's weights straight out of ``stacked_blocks`` (``params["blocks"]``
    after ``stack_block_params``) and writes its state into pre-allocated
    stacked buffers via donated ``.at[i].set`` — peak extra memory is the
    final stacked state plus ONE layer (the same incremental pattern as
    ``quant.stream.build_streamed_quant_base``, ref ptq_wanx.py's
    per-module loop :261-385 never materializes a second model either).

    Block linears only (non-block layers go through prepare_quant_state;
    they are a few MB). Rotations run on-device (f32 FWHT). GPTQ/static-A8
    are handled exactly as in prepare_quant_state when calib carries the
    matching entries. Returns (policies, scan_state, rotations) — pass
    scan_state to ``QuantCtx`` via ``ctx.scan_state`` (it is already in
    the stacked layout ``make_scan_ctx`` would produce).
    """
    from wanq_tpu.quant.stream import BLOCK_LINEARS

    calib_max = reduce_calib(calib) if calib is not None else {}
    # scan shares ONE compiled block body, so every layer of a suffix must
    # resolve to the same policy; a layer-index-dependent regex (e.g.
    # remain_fp for first/last blocks) cannot ride the stacked path — fail
    # loudly instead of silently applying blocks.0's policy everywhere
    # (the list-form prepare_quant_state + stack_quant_state pair enforces
    # the same invariant)
    pol_by_sfx = {}
    for sfx in BLOCK_LINEARS:
        pols = [qcfg.resolve(f"blocks.{i}.{sfx}") for i in range(num_layers)]
        if any(p != pols[0] for p in pols[1:]):
            bad = [i for i in range(num_layers) if pols[i] != pols[0]]
            raise ValueError(
                f"prepare_quant_state_stacked needs a uniform policy per "
                f"block suffix (scan-over-blocks shares one compiled body); "
                f"'{sfx}' resolves differently at layers {bad[:4]} vs 0 — "
                f"use prepare_quant_state on list-form params instead"
            )
        pol_by_sfx[sfx] = pols[0]
    policies = {
        f"blocks.{i}.{sfx}": pol_by_sfx[sfx]
        for sfx in BLOCK_LINEARS for i in range(num_layers)
    }

    jwrite = jax.jit(
        lambda S, st, i: jax.tree.map(lambda s, x: s.at[i].set(x), S, st),
        donate_argnums=0,
    )
    scan_state: Dict[str, Dict[str, jax.Array]] = {}
    rot_dims = set()
    rot_cache: Dict[int, jax.Array] = {}
    for sfx in BLOCK_LINEARS:
        policy = pol_by_sfx[sfx]
        if not policy.is_quantized:
            continue
        node = params_get({"blocks": stacked_blocks}, f"blocks.{sfx}")
        stacked = None
        for i in range(num_layers):
            w = node["w"][i].astype(jnp.float32)
            name = f"blocks.{i}.{sfx}"
            st = _layer_state(
                policy, name, w, calib_max, seed, targets,
                rotate_on_device=True, rot_dims=rot_dims,
                rot_cache=rot_cache,
            )
            if stacked is None:
                stacked = jax.tree.map(
                    lambda l: jnp.zeros((num_layers,) + l.shape, l.dtype), st)
            stacked = jwrite(stacked, st, i)
            del st
        scan_state[sfx] = stacked

    rotations = {
        d: jnp.asarray(rotation_for_dim(d, seed=seed).astype(np.float32))
        for d in rot_dims
    }
    return policies, scan_state, rotations


# ---------------------------------------------------------------------------
# artifact io (ref: quant_params.pth + int_weight.pt, orbax-free npz format)
# ---------------------------------------------------------------------------


def strip_quantized_weights(params: Params, policies) -> Params:
    """Replace the FP weight of every quantized layer with a [1, 1]
    placeholder — the TPU analog of the reference's hardware refactor
    deleting the FP copies after int8 export (quant_wanx.py:137-185
    ``del module.weight`` / fp_module removal). The sim and int8 qlinear
    paths read ``state['w_q']`` / ``state['w_int8']``, never
    ``params['w']``, so at 14B this frees the full bf16 weight residency
    (≈28 GB → placeholders) while biases and FP-kept layers stay.

    Returns a new tree (shallow-copied along stripped paths); running an
    ``fp``-mode forward with a stripped tree fails loudly on shape.

    Works on both the list form and the STACKED (scan) form of ``blocks``:
    stacked leaves [L, C_in, C_out] become [L, 1, 1] placeholders (scan xs
    keep their leading L), stripped once per suffix since scan requires
    uniform per-block policies anyway."""
    import copy

    out = copy.copy(params)
    stacked = isinstance(out.get("blocks"), dict)
    if isinstance(out.get("blocks"), list):
        out["blocks"] = [copy.copy(b) for b in out["blocks"]]

    def _strip(path: str):
        if stacked and path.startswith("blocks."):
            # 'blocks.<i>.<suffix>' → strip the stacked leaf at <suffix>
            path = "blocks." + path.split(".", 2)[2]
        parts = path.split(".")
        node = out
        for p in parts[:-1]:
            nxt = node[int(p)] if isinstance(node, list) else node[p]
            nxt = copy.copy(nxt)
            if isinstance(node, list):
                node[int(p)] = nxt
            else:
                node[p] = nxt
            node = nxt
        leaf = copy.copy(node[parts[-1]])
        if "w" in leaf:
            w = leaf["w"]
            shape = (w.shape[0], 1, 1) if getattr(w, "ndim", 2) == 3 else (1, 1)
            leaf["w"] = jnp.zeros(shape, getattr(w, "dtype", jnp.bfloat16))
        node[parts[-1]] = leaf

    for name, pol in policies.items():
        if getattr(pol, "is_quantized", False):
            _strip(name)
    return out


def save_quant_state(path: str, state: Dict[str, Dict[str, jax.Array]], seed: int = 0):
    """Serialize the quant-param dict (ref ptq_wanx.py:254-257 saves
    quant_params.pth; we use one flat npz). Rotation matrices are not
    stored — they are regenerated from the seed (ref quant_model.py:172
    skips saving them too)."""
    flat = {"__seed__": np.asarray(seed)}
    for name, st in state.items():
        for k, v in st.items():
            a = np.asarray(v)
            if a.dtype == np.dtype(jnp.bfloat16):
                # npz has no bfloat16 descr (ml_dtypes leaves load back as
                # raw |V2 void) — store the bit pattern as uint16 with a
                # key tag and restore the view on load (bf16 leaves:
                # SVDQuant lowrank_a/b, merged QLoRA adapters)
                flat[f"{name}|{k}|bf16"] = a.view(np.uint16)
            else:
                flat[f"{name}|{k}"] = a
    np.savez(path, **flat)


def load_quant_state(path: str) -> Tuple[Dict[str, Dict[str, jax.Array]], int]:
    data = np.load(path)
    state: Dict[str, Dict[str, jax.Array]] = {}
    seed = 0
    for key in data.files:
        if key == "__seed__":
            seed = int(data[key])
            continue
        parts = key.split("|")
        name, k = parts[0], parts[1]
        a = data[key]
        if len(parts) == 3 and parts[2] == "bf16":
            a = a.view(np.dtype(jnp.bfloat16))
        state.setdefault(name, {})[k] = jnp.asarray(a)
    return state, seed


def rebuild_rotations(
    state: Dict[str, Dict[str, jax.Array]],
    policies: Mapping[str, LayerPolicy],
    seed: int,
) -> Dict[int, jax.Array]:
    """Regenerate the activation-side rotation matrices for a loaded quant
    state (rotations are not serialized; ref quant_model.py:172). The
    in_features dim comes from whichever deployed-weight entry exists —
    packed int4 weights store K/2 rows."""
    rotations: Dict[int, jax.Array] = {}
    for n, st in state.items():
        pol = policies.get(n)
        if pol is None or not pol.uses_rotation:
            continue
        if "w_q" in st or "w_int8" in st:
            c_in = int(st.get("w_q", st.get("w_int8")).shape[0])
        elif "w_int4" in st or "w_int4g" in st:
            c_in = 2 * int(st.get("w_int4", st.get("w_int4g")).shape[0])
        else:
            raise KeyError(f"no deployed weight entry in quant state for {n}")
        if c_in not in rotations:
            rotations[c_in] = jnp.asarray(
                rotation_for_dim(c_in, seed=seed).astype(np.float32)
            )
    return rotations


def load_reference_calib(path: str) -> Dict[str, np.ndarray]:
    """Load a reference calib_data_wanx1.pth artifact (torch dict of
    {layer_name: [N_calls, C]} absmax stacks) for scale-dict parity checks."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.float().numpy() for k, v in d.items()}


def load_reference_quant_params(
    path_or_dict,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Import the reference's saved ``quant_params.pth`` into this
    framework's per-layer scale-dict schema.

    The reference artifact is ``model.quant_param_dict`` (saved by
    ``save_quant_param_dict_``, quant_model.py:161-174): one entry per
    quantizer module path — ``<layer>.w_quantizer`` / ``<layer>.a_quantizer``
    — each ``{'delta', 'zero_point'[, 'channel_mask'][, 'rotation_matrix':
    None]}``. Weight deltas are per-output-channel ``[C_out, 1]`` (torch
    Linear weight layout); they flatten to our ``delta_w [C_out]``.
    ``channel_mask`` is per input channel ``[C_in]``.

    Activation entries import only when per-tensor (``numel == 1`` — a
    frozen StaticQuantizer scale); DynamicQuantizer deltas are transient
    per-call values the reference never reuses, so they are skipped.
    Rotation matrices are NOT recoverable: the reference regenerates them
    from torch's *global* RNG at load (``get_rotation_matrix`` →
    ``random_hadamard_matrix`` with no explicit seed,
    quarot_quant_layer.py:27-28) — entries that carry a rotation slot are
    imported with ``"rotated": True`` so callers can refuse to deploy them
    without a matching rotation replay.

    Returns ``{layer_path: {delta_w, zp_w[, channel_mask][, delta_a, zp_a]
    [, rotated]}}`` as numpy arrays, directly comparable against
    :func:`prepare_layer_state` output (``compare_scale_dicts``).
    """
    if isinstance(path_or_dict, (str, bytes)):
        import torch

        d = torch.load(path_or_dict, map_location="cpu", weights_only=False)
    else:
        d = path_or_dict

    def _np(t):
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().float().cpu().numpy()
        return np.asarray(t, dtype=np.float32)

    out: Dict[str, Dict[str, np.ndarray]] = {}
    for full_name, entry in d.items():
        # artifacts saved under FSDP carry wrapper prefixes the reference
        # itself strips at load (quant_generate.py:385-388)
        full_name = full_name.replace("_fsdp_wrapped_module.", "")
        for suffix, dkey, zkey in (
            (".w_quantizer", "delta_w", "zp_w"),
            (".a_quantizer", "delta_a", "zp_a"),
        ):
            if not full_name.endswith(suffix):
                continue
            layer = full_name[: -len(suffix)]
            delta = _np(entry["delta"])
            zp = _np(entry["zero_point"])
            if suffix == ".a_quantizer" and delta.size != 1:
                break  # transient dynamic-quantizer params: recomputed live
            st = out.setdefault(layer, {})
            st[dkey] = delta.reshape(-1)
            st[zkey] = zp.reshape(-1)
            if entry.get("channel_mask") is not None:
                st["channel_mask"] = _np(entry["channel_mask"]).reshape(-1)
            if "rotation_matrix" in entry:
                st["rotated"] = np.asarray(True)
            break
    return out


def state_from_reference_params(
    params: Params,
    policies: Mapping[str, LayerPolicy],
    imported: Mapping[str, Mapping[str, np.ndarray]],
    targets: str = "both",
) -> Dict[str, Dict[str, jax.Array]]:
    """Deploy directly from an imported reference ``quant_params.pth``
    (:func:`load_reference_quant_params`): rebuild each quantized layer's
    deployed weights from the FP weight and the artifact's grids — the
    analog of the reference's own load path
    (``update_quantized_weight_scaled``, quant_model.py:138-157), so a
    reference user's PTQ artifact drops into this framework unchanged.

    Rotated layers (quarot/viditq artifacts) raise: the reference
    regenerates rotation matrices from torch's global RNG at load, which
    is not recoverable from the artifact — re-run PTQ here instead.
    """
    state: Dict[str, Dict[str, jax.Array]] = {}
    for name, policy in policies.items():
        if not policy.is_quantized:
            continue
        if name not in imported:
            raise KeyError(
                f"reference artifact has no entry for quantized layer "
                f"{name} — was it PTQ'd with a different remain_fp_regex?"
            )
        imp = imported[name]
        if imp.get("rotated") is not None and bool(imp["rotated"]):
            raise ValueError(
                f"{name}: the reference artifact used a rotation "
                "(quarot/viditq) whose matrix is regenerated from torch's "
                "global RNG at load and cannot be recovered from the "
                "artifact — re-run PTQ in this framework for rotated "
                "methods"
            )
        wcfg = policy.weight
        assert wcfg is not None
        wf = params_get(params, name)["w"].astype(jnp.float32)
        st: Dict[str, jax.Array] = {}
        if "channel_mask" in imp:
            mask = jnp.asarray(imp["channel_mask"], jnp.float32)
            st["channel_mask"] = mask
            wf = wf / mask[:, None]
        d = jnp.asarray(imp["delta_w"], jnp.float32)
        z = jnp.asarray(imp["zp_w"], jnp.float32)
        st["delta_w"], st["zp_w"] = d, z
        if targets in ("sim", "both"):
            from wanq_tpu.quant.quantizers import fake_quant

            st["w_q"] = fake_quant(
                wf, d[None, :], z[None, :], wcfg.active_bits, wcfg.sym
            )
        if wcfg.active_bits in (4, 8) and targets in ("int8", "both"):
            lo, hi = (-8, 7) if wcfg.active_bits == 4 else (-128, 127)
            q = jnp.clip(
                jnp.round(wf / d[None, :]) - z[None, :], lo, hi
            ).astype(jnp.int8)
            if wcfg.active_bits == 4 and q.shape[0] % 2 == 0:
                st["w_int4"] = pack_int4(q)
            else:
                st["w_int8"] = q
            st["scale_w"] = d
            st["zp_w_int"] = z
        if "delta_a" in imp and policy.act is not None and not policy.act.dynamic:
            st["delta_a"] = jnp.asarray(imp["delta_a"], jnp.float32)
            st["zp_a"] = jnp.asarray(imp["zp_a"], jnp.float32)
        state[name] = st
    return state


def compare_scale_dicts(
    ours: Mapping[str, Mapping[str, Any]],
    theirs: Mapping[str, Mapping[str, np.ndarray]],
    rtol: float = 1e-3,
) -> Dict[str, Any]:
    """Scale-dict parity report between this framework's quant state and
    an imported reference artifact (the driver north-star's 'scale-dict
    parity against reference PTQ artifacts').

    Compares every key present on both sides per layer (delta_w / zp_w /
    channel_mask / delta_a / zp_a), returning ``{'layers': {layer:
    {key: max_rel_err}}, 'worst': (layer, key, err), 'pass': bool}``.
    """
    report: Dict[str, Any] = {"layers": {}, "worst": None, "pass": True}
    worst = ("", "", -1.0)
    for layer, tstate in theirs.items():
        if layer not in ours:
            continue
        ostate = ours[layer]
        errs = {}
        for key in ("delta_w", "zp_w", "channel_mask", "delta_a", "zp_a"):
            if key not in tstate or key not in ostate:
                continue
            a = np.asarray(ostate[key], np.float64).reshape(-1)
            b = np.asarray(tstate[key], np.float64).reshape(-1)
            if a.shape != b.shape:
                errs[key] = float("inf")
            else:
                denom = np.maximum(np.abs(b), 1e-8)
                errs[key] = float(np.max(np.abs(a - b) / denom))
            if errs[key] > worst[2]:
                worst = (layer, key, errs[key])
            if errs[key] > rtol:
                report["pass"] = False
        report["layers"][layer] = errs
    report["worst"] = worst
    return report
