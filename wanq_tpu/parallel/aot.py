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


def _with_shardings(avals, shardings):
    """Attach a NamedSharding pytree onto a matching ShapeDtypeStruct tree."""
    return jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        avals,
        shardings,
    )


def _scan_state_sharding(mesh: Mesh, key: str, leaf) -> NamedSharding:
    """Stacked per-block quant state [L, ...]: weight matrices split on
    their output dim, per-C_out vectors on theirs."""
    fs = mesh.shape["fsdp"]
    if key in ("w_q", "w_int8", "w_int4") and leaf.shape[-1] % fs == 0:
        return NamedSharding(mesh, P(None, None, "fsdp"))
    if key in ("delta_w", "zp_w", "scale_w", "zp_w_int") and (
        len(leaf.shape) >= 2 and leaf.shape[1] % fs == 0
    ):
        return NamedSharding(mesh, P(None, "fsdp"))
    return NamedSharding(mesh, P())


def aot_validate(
    cfg: WanConfig,
    mesh: Mesh,
    quant: Optional[QuantConfig] = None,
    latent_fhw: Tuple[int, int, int] = (4, 16, 16),
    batch: int = 2,
) -> str:
    """AOT-compile one CFG denoise step of ``cfg`` over ``mesh`` (abstract
    weights; W8A8 scan state when ``quant`` is given). Returns a short
    summary string; raises on any lowering/partitioning failure."""
    plan = ShardingPlan(mesh)
    sp_total = plan.sp_size

    aparams = abstract_params(cfg)
    astacked = jax.eval_shape(stack_block_params, aparams)
    astacked = _with_shardings(astacked, param_shardings(astacked, mesh))

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
                    mesh, str(getattr(path[-1], "key", "")), leaf
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
    ax = jax.ShapeDtypeStruct(
        (b, cfg.in_dim, f, h, w), jnp.float32,
        sharding=NamedSharding(mesh, P("dp", None, None, None, None)),
    )
    at = jax.ShapeDtypeStruct((b,), jnp.float32, sharding=repl)
    ac = jax.ShapeDtypeStruct(
        (b, cfg.text_len, cfg.text_dim), jnp.float32,
        sharding=NamedSharding(mesh, P("dp", None, None)),
    )

    def step(params, qctx, x, t, c):
        return dit_forward(params, cfg, x, t, c, seq_len, ctx=qctx, plan=plan)

    with mesh:
        compiled = jax.jit(step).lower(astacked, actx, ax, at, ac).compile()
    mem = compiled.memory_analysis()
    argb = getattr(mem, "argument_size_in_bytes", 0)
    return (
        f"aot ok: dim={cfg.dim} layers={cfg.num_layers} heads={cfg.num_heads} "
        f"mesh={dict(mesh.shape)} seq_len={seq_len} "
        f"quant={'w8a8' if quant else 'fp'} args={argb/1e9:.1f}GB"
    )
