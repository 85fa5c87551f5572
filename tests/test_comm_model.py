"""Comm-model HLO collective parsing (tools/comm_model.py).

The parser reads XLA's optimized-HLO text; this pins that the regexes
track the current formats (iota + brace replica_groups, -start variants,
op_name loop detection) against a real SPMD compile on the virtual mesh.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from comm_model import _shape_bytes, collect_collectives, model_time  # noqa: E402


def test_shape_bytes():
    assert _shape_bytes("bf16[2,8,128]") == 2 * 8 * 128 * 2
    assert _shape_bytes("f32[16]") == 64
    # tuple shapes (all-to-all emits them) sum their parts
    assert _shape_bytes("(f32[4,2], f32[4,2])") == 2 * 32
    assert _shape_bytes("s8[128,128]") == 128 * 128


def test_model_time_shapes():
    bw = 2 * 4.5e10
    # all-reduce costs 2x an all-gather of the same bytes
    ag = model_time("all-gather", 1e9, 4, bw)
    ar = model_time("all-reduce", 1e9, 4, bw)
    assert abs(ar - 2 * ag) < 1e-12
    # permute is a straight shard transfer
    assert model_time("collective-permute", 1e9, 2, bw) == 1e9 / bw


def test_collectives_parsed_from_real_spmd_hlo():
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.parallel.aot import aot_compile_step
    from wanq_tpu.parallel.sharding import make_mesh

    cfg = tiny_config()
    mesh = make_mesh(1, 2, 2, 2)
    compiled, _, _ = aot_compile_step(cfg, mesh, latent_fhw=(4, 16, 16))
    colls = collect_collectives(compiled.as_text(), loop_trips=cfg.num_layers)
    assert colls, "no collectives found — parser or partitioner drifted"
    ops = {c[0] for c in colls}
    # the hybrid Ulysses x ring layout must produce at least the ring
    # permutes and one gather/all-to-all family
    assert "collective-permute" in ops, ops
    assert ops & {"all-gather", "all-to-all", "all-reduce"}, ops
    # group sizes parsed (brace or iota form) for grouped collectives
    grouped = [c for c in colls if c[0] in ("all-gather", "all-to-all",
                                            "all-reduce")]
    assert grouped and all(g[1] >= 2 for g in grouped), grouped[:5]
    # scan-body collectives must be multiplied by the trip count
    assert any(c[3] == cfg.num_layers for c in colls), (
        "no in-loop collectives detected — op_name loop detection drifted")


def test_no_parasitic_fullseq_allgathers_in_block_loop():
    """Regression for the round-4 comm-layout work (BENCH_NOTES 'Token-
    sharding pin + ZeRO-3 use-time weight gather'): with activations
    pinned token-sharded, per-block weights gathered ZeRO-3-style, and the
    GEMM wrappers unflattened, the scan body must contain NO all-gather
    that reconstructs the FULL sequence — those were the 330+ GB/step
    parasitic regathers at 14B (e.g. the [B,S,C]→[B·S,C] flatten at each
    int8 GEMM interface). Intended seq movement is all-to-all (Ulysses)
    and collective-permute (ring) only."""
    import re

    from wanq_tpu.configs import tiny_config
    from wanq_tpu.parallel.aot import aot_compile_step
    from wanq_tpu.parallel.sharding import make_mesh
    from wanq_tpu.quant.config import QuantConfig

    cfg = tiny_config()
    mesh = make_mesh(1, 2, 2, 2)
    quant = QuantConfig.from_dict({
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
        "remain_fp_regex": r"text_embedding|time_embedding|time_projection",
    })
    compiled, seq_len, _ = aot_compile_step(
        cfg, mesh, quant=quant, latent_fhw=(4, 16, 16),
        full_shard=True, strip_fp=True,
    )
    hlo = compiled.as_text()
    bad = []
    weight_gathers = 0
    for line in hlo.splitlines():
        m = re.search(
            r"=\s*((?:\([^)]*\)|\S+))\s+(all-gather)(?:-start)?\(", line)
        if not m or "/while/body" not in line:
            continue
        shape_str = m.group(1)
        dims = {
            int(d)
            for _, ds in re.findall(r"(\w+)\[([\d,]*)\]", shape_str)
            for d in ds.split(",") if d
        }
        if seq_len in dims:
            bad.append(line.strip()[:200])
        else:
            weight_gathers += 1
    assert not bad, (
        f"full-seq (S={seq_len}) all-gathers re-appeared in the scan body "
        f"— an activation lost its token sharding:\n" + "\n".join(bad[:8])
    )
    # the ZeRO-3 use-time weight gathers must still be there
    assert weight_gathers > 0, "no weight all-gathers in scan body — did " \
        "full_shard storage or gather_weights change?"
