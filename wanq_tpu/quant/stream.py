"""Streamed per-layer quantized model construction.

Builds a quantized Wan DiT whose FULL-PRECISION form never exists
anywhere: each block is generated on device inside one jit program as
pure workspace, its linears are int-quantized (prepare_layer_state),
the FP copies are stripped, and the quant state writes straight into
pre-allocated stacked scan arrays via donated dynamic-update-slice —
peak extra residency is ONE block of state. This is what puts Wan 14B
on a single 16 GB chip for both inference (tools/deploy_14b_probe.py)
and QLoRA fine-tuning (tools/qlora_smoke.py); the reference's 14B path
needs 8-GPU FSDP just to materialize the model (28 GB bf16 weights).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_LINEARS = (
    "self_attn.q", "self_attn.k", "self_attn.v", "self_attn.o",
    "cross_attn.q", "cross_attn.k", "cross_attn.v", "cross_attn.o",
    "ffn.0", "ffn.2",
)


def build_streamed_quant_base(
    cfg,
    qcfg,
    *,
    randomize_head: bool = True,
    act_minmax_synth: Optional[Tuple[float, float]] = (8.0, -8.0),
    log: Optional[Callable[[str], None]] = None,
):
    """→ (stacked_params, qctx, total_quant_bytes).

    ``stacked_params``: scan-form params with the quantized linears'
    FP weights stripped to [1, 1] placeholders. ``qctx``: an int8-mode
    QuantCtx whose ``scan_state`` holds the stacked per-block quant state.
    ``act_minmax_synth``: frozen bounds for static-act sites when no
    calibration ran (random-init probes; ±8 safely bounds GELU outputs —
    real deployments calibrate and pass None to require calib data).
    """
    from wanq_tpu.models.dit import (
        make_block_generator,
        make_nonblock_generator,
        stack_block_params,
    )
    from wanq_tpu.quant.ptq import prepare_layer_state, strip_quantized_weights
    from wanq_tpu.quant.qlinear import QuantCtx

    log = log or (lambda m: None)
    t0 = time.time()
    params = jax.jit(make_nonblock_generator(cfg))(jax.random.PRNGKey(0))
    if randomize_head:
        # head.head is zero-init (DiT convention); randomize so outputs —
        # and timings — reflect the full network, not a zero graph
        params["head"]["head"]["w"] = (
            0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                     params["head"]["head"]["w"].shape)
        ).astype(params["head"]["head"]["w"].dtype)
    block_policies = {f"blocks.0.{ln}": qcfg.resolve(f"blocks.0.{ln}")
                      for ln in BLOCK_LINEARS}
    gen_block = make_block_generator(cfg)
    synth = (
        (np.asarray([act_minmax_synth[0]], np.float32),
         np.asarray([act_minmax_synth[1]], np.float32))
        if act_minmax_synth is not None else None
    )

    def build_layer(key):
        bp = gen_block(key)
        st = {}
        for ln in BLOCK_LINEARS:
            node = bp
            for part in ln.split("."):
                node = node[part]
            pol = block_policies[f"blocks.0.{ln}"]
            if not pol.is_quantized:
                continue
            st[ln] = prepare_layer_state(
                pol, node["w"], None, None, targets="int8",
                act_minmax=synth
                if (pol.act is not None and not pol.act.dynamic) else None,
            )
        sb = strip_quantized_weights({"blocks": [bp]},
                                     block_policies)["blocks"][0]
        return sb, st

    jbuild = jax.jit(build_layer)
    jwrite = jax.jit(
        lambda S, st, i: jax.tree.map(lambda s, x: s.at[i].set(x), S, st),
        donate_argnums=0)
    policies: Dict[str, object] = {}
    scan_state = None
    blocks = []
    total_qbytes = 0
    for i in range(cfg.num_layers):
        sb, st = jbuild(jax.random.PRNGKey(100 + i))
        blocks.append(sb)
        if scan_state is None:
            scan_state = jax.tree.map(
                lambda l: jnp.zeros((cfg.num_layers,) + l.shape, l.dtype), st)
            total_qbytes = sum(
                l.size * l.dtype.itemsize
                for l in jax.tree.leaves(scan_state))
        scan_state = jwrite(scan_state, st, i)
        for ln in BLOCK_LINEARS:
            policies[f"blocks.{i}.{ln}"] = block_policies[f"blocks.0.{ln}"]
        if i % 10 == 0:
            log(f"  layer {i} quantized ({time.time()-t0:.0f}s)")
    jax.block_until_ready(scan_state)
    params["blocks"] = blocks
    stacked = stack_block_params(params)
    qctx = QuantCtx(mode="int8", policies=policies, state={})
    qctx.scan_state = scan_state
    log(f"streamed quantized base in {time.time()-t0:.0f}s: "
        f"{total_qbytes/2**30:.2f} GiB int-at-rest")
    return stacked, qctx, total_qbytes
