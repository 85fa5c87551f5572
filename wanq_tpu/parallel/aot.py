"""AOT compile-validation of large configs on a device mesh.

Catches the bugs that only appear at scale — sharding divisibility
(14B: 40 heads, dim 5120, ffn 13824 against fsdp/sp/ring axis sizes),
scan-over-40-blocks lowering, quant-state layout under GSPMD — WITHOUT
allocating any weights: params and quant state are ShapeDtypeStructs with
NamedShardings attached, and ``jit(step).lower(...).compile()`` runs the
full XLA SPMD partitioner. The reference could only discover these on a
real 8-GPU job (wan/configs/wan_t2v_14B.py:18-29 + fsdp.py); here the
check runs on the virtual CPU mesh in CI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wanq_tpu.configs import WanConfig
from wanq_tpu.models.dit import (
    abstract_params,
    dit_forward,
    linear_layer_names,
    stack_block_params,
    stack_quant_state,
)
from wanq_tpu.parallel.sharding import ShardingPlan, param_shardings
from wanq_tpu.quant.config import QuantConfig
from wanq_tpu.quant.qlinear import QuantCtx


def _per_device_bytes(tree) -> int:
    """Per-device STORAGE bytes of a ShapeDtypeStruct tree with attached
    NamedShardings (sharding.shard_shape gives one device's shard) —
    computed from the specs because XLA's memory_analysis reports logical
    (unsharded) argument sizes."""
    import numpy as np

    total = 0
    for leaf in jax.tree.leaves(tree):
        shape = leaf.shape
        if getattr(leaf, "sharding", None) is not None:
            shape = leaf.sharding.shard_shape(leaf.shape)
        total += int(np.prod(shape, dtype=np.int64)) * leaf.dtype.itemsize
    return total


def _with_shardings(avals, shardings):
    """Attach a NamedSharding pytree onto a matching ShapeDtypeStruct tree."""
    return jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        avals,
        shardings,
    )


def _scan_state_sharding(
    mesh: Mesh, key: str, leaf, full_shard: bool = False
) -> NamedSharding:
    """Stacked per-block quant state [L, ...] — shared with the runtime
    deployment path (quant.ptq.scan_state_sharding_for) so AOT planning
    and execution place state identically."""
    from wanq_tpu.quant.ptq import scan_state_sharding_for

    return scan_state_sharding_for(mesh, key, leaf, full_shard)


def aot_compile_step(
    cfg: WanConfig,
    mesh: Mesh,
    quant: Optional[QuantConfig] = None,
    latent_fhw: Tuple[int, int, int] = (4, 16, 16),
    batch: int = 2,
    full_shard: bool = False,
    strip_fp: bool = False,
):
    """AOT-compile one CFG denoise step of ``cfg`` over ``mesh`` with
    abstract weights (W8A8 scan state when ``quant`` is given). Returns
    ``(compiled, seq_len, arg_tree)`` — the compiled SPMD executable (its
    ``as_text()`` HLO carries the real collectives, consumed by
    tools/comm_model.py), the padded token count, and the abstract
    argument tree used for residency accounting."""
    plan = ShardingPlan(mesh)
    sp_total = plan.sp_size

    aparams = abstract_params(cfg)
    step_params = aparams
    if strip_fp and quant is not None:
        # quant state derives from the REAL weight shapes; only the tree
        # the step consumes gets the placeholder weights
        from wanq_tpu.quant.ptq import strip_quantized_weights

        names0 = linear_layer_names(cfg)
        step_params = strip_quantized_weights(
            aparams, {n: quant.resolve(n) for n in names0}
        )
    astacked = jax.eval_shape(stack_block_params, step_params)
    astacked = _with_shardings(
        astacked, param_shardings(astacked, mesh, full_shard)
    )

    f, h, w = latent_fhw
    tokens = (
        (f // cfg.patch_size[0])
        * (h // cfg.patch_size[1])
        * (w // cfg.patch_size[2])
    )
    seq_len = -(-tokens // sp_total) * sp_total

    actx = None
    if quant is not None:
        names = linear_layer_names(cfg)
        policies = {n: quant.resolve(n) for n in names}

        def state_of(p):
            from wanq_tpu.quant.ptq import prepare_quant_state

            return prepare_quant_state(p, names, quant, targets="int8")[1]

        a_state = jax.eval_shape(state_of, aparams)

        def stack_of(s):
            tmp = QuantCtx(mode="int8", policies=policies, state=s)
            return stack_quant_state(tmp, cfg.num_layers)

        a_other, a_scan = jax.eval_shape(stack_of, a_state)
        a_scan = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.ShapeDtypeStruct(
                leaf.shape,
                leaf.dtype,
                sharding=_scan_state_sharding(
                    mesh, str(getattr(path[-1], "key", "")), leaf, full_shard
                ),
            ),
            a_scan,
        )
        a_other = jax.tree.map(
            lambda leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=NamedSharding(mesh, P())
            ),
            a_other,
        )
        actx = QuantCtx(mode="int8", policies=policies, state=a_other)
        actx.scan_state = a_scan

    dp = mesh.shape["dp"]
    b = max(batch, dp)
    repl = NamedSharding(mesh, P())
    is_i2v = cfg.model_type == "i2v"
    # i2v: x carries out_dim latent channels; the conditioning latents +
    # mask (in_dim - out_dim channels) arrive via ``y`` and concat inside
    # dit_forward (ref model.py:577); clip_fea feeds img_emb
    x_ch = cfg.out_dim if is_i2v else cfg.in_dim
    ax = jax.ShapeDtypeStruct(
        (b, x_ch, f, h, w), jnp.float32,
        sharding=NamedSharding(mesh, P("dp", None, None, None, None)),
    )
    at = jax.ShapeDtypeStruct((b,), jnp.float32, sharding=repl)
    ac = jax.ShapeDtypeStruct(
        (b, cfg.text_len, cfg.text_dim), jnp.float32,
        sharding=NamedSharding(mesh, P("dp", None, None)),
    )
    aclip = ay = None
    if is_i2v:
        aclip = jax.ShapeDtypeStruct(
            (b, 257, cfg.clip_dim), jnp.float32,
            sharding=NamedSharding(mesh, P("dp", None, None)),
        )
        ay = jax.ShapeDtypeStruct(
            (b, cfg.in_dim - cfg.out_dim, f, h, w), jnp.float32,
            sharding=NamedSharding(mesh, P("dp", None, None, None, None)),
        )

    def step(params, qctx, x, t, c, clip_fea, y):
        return dit_forward(params, cfg, x, t, c, seq_len, ctx=qctx,
                           clip_fea=clip_fea, y=y, plan=plan)

    with mesh:
        compiled = (
            jax.jit(step)
            .lower(astacked, actx, ax, at, ac, aclip, ay)
            .compile()
        )
    arg_tree = [astacked, actx, ax, at, ac]
    if is_i2v:
        arg_tree += [aclip, ay]  # i2v conditioning counts toward residency
    return compiled, seq_len, arg_tree


def aot_validate(
    cfg: WanConfig,
    mesh: Mesh,
    quant: Optional[QuantConfig] = None,
    latent_fhw: Tuple[int, int, int] = (4, 16, 16),
    batch: int = 2,
    full_shard: bool = False,
    strip_fp: bool = False,
) -> str:
    """AOT-compile and summarize (raises on any lowering/partitioning
    failure). ``full_shard`` stores weights over every non-dp axis (the
    reference's dit_fsdp-on-all-8-ranks memory layout); ``strip_fp``
    drops the FP copies of quantized weights (the reference's
    hardware-refactor deletion, quant_wanx.py:137-185)."""
    compiled, seq_len, arg_tree = aot_compile_step(
        cfg, mesh, quant=quant, latent_fhw=latent_fhw, batch=batch,
        full_shard=full_shard, strip_fp=strip_fp,
    )
    mem = compiled.memory_analysis()
    tmpb = getattr(mem, "temp_size_in_bytes", 0)
    argb = _per_device_bytes(arg_tree)
    return (
        f"aot ok: dim={cfg.dim} layers={cfg.num_layers} heads={cfg.num_heads} "
        f"mesh={dict(mesh.shape)} seq_len={seq_len} "
        f"quant={'w8a8' if quant else 'fp'}"
        f"{' full_shard' if full_shard else ''} "
        f"args={argb/1e9:.2f}GB/device xla_temp={tmpb/1e9:.2f}GB"
    )
