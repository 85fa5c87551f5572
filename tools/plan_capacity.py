"""Deployment capacity planner: per-device memory for a Wan config across
candidate device meshes, computed by the real XLA SPMD partitioner on a
virtual CPU mesh (no TPU needed, no allocation).

The reference's analog is its multi-GPU efficiency table (an image asset,
examples/Wan2.1/README.md:308-320); here the numbers come from
parallel/aot.py::aot_validate — exact per-device argument residency from
the sharding specs plus XLA's temp estimate.

Usage:
  python tools/plan_capacity.py --task t2v-14B \
      --meshes 1x2x2x2 1x8x1x1 1x4x2x1 --quant --full_shard --strip_fp
Mesh syntax: dp x fsdp x sp x ring (e.g. 1x2x2x2).

--auto_bits GIB additionally prints the capacity-aware mixed-precision
plan (quant/planner.py): which linear classes get W8 under a GIB
weight-state budget, with the per-bitwidth byte accounting — e.g.
``--auto_bits 9.0`` for single-chip 14B 720p (measured headroom).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("plan_capacity")
    p.add_argument("--task", default="t2v-14B")
    p.add_argument("--meshes", nargs="+", default=["1x2x2x2", "1x8x1x1"])
    p.add_argument("--quant", action="store_true", help="W8A8 layout")
    p.add_argument("--full_shard", action="store_true")
    p.add_argument("--strip_fp", action="store_true")
    p.add_argument("--latent_fhw", default="4,16,16",
                   help="latent frames,height,width for the probe step")
    p.add_argument("--auto_bits", type=float, default=None, metavar="GIB",
                   help="print the W4->W8 capacity plan for this "
                        "weight-state budget (GiB)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    sizes = [tuple(int(d) for d in m.split("x")) for m in args.meshes]
    need = max(1, max(s[0] * s[1] * s[2] * s[3] for s in sizes))
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={need}"
        ).strip()

    from wanq_tpu.configs import WAN_CONFIGS
    from wanq_tpu.parallel import make_mesh
    from wanq_tpu.parallel.aot import aot_validate
    from wanq_tpu.quant import QuantConfig

    cfg = WAN_CONFIGS[args.task]
    if args.auto_bits is not None:
        from wanq_tpu.quant.planner import class_weight_bytes, plan_capacity_bits

        plan = plan_capacity_bits(cfg, int(args.auto_bits * 2**30))
        print(plan.report(), flush=True)
        b4 = sum(class_weight_bytes(cfg, 4).values())
        b8 = sum(class_weight_bytes(cfg, 8).values())
        print(f"  bounds: all-W4 {b4/2**30:.2f} GiB, all-W8 {b8/2**30:.2f} "
              f"GiB; planned {plan.total_bytes/2**30:.2f} GiB", flush=True)
    qcfg = None
    if args.quant:
        qcfg = QuantConfig.from_dict({
            "remain_fp_regex":
                r"text_embedding|time_embedding|time_projection|head\.head",
            "weight": {"n_bits": 8, "sym": False},
            "act": {"n_bits": 8, "sym": True},
        })
    fhw = tuple(int(x) for x in args.latent_fhw.split(","))
    for dims in sizes:
        mesh = make_mesh(*dims)
        print(aot_validate(
            cfg, mesh, quant=qcfg, latent_fhw=fhw,
            full_shard=args.full_shard, strip_fp=args.strip_fp,
        ), flush=True)


if __name__ == "__main__":
    main()
