"""AOT communication model: per-collective bytes/step for the multi-chip
14B deployment, with predicted step times on real ICI (round-3 VERDICT #6).

No multi-chip hardware is attached, but the SPMD program IS available: the
XLA partitioner emits the same collectives on the virtual CPU mesh as on a
TPU pod slice (the partitioning pass is backend-independent; only codegen
differs). This tool AOT-compiles the full quantized 14B denoise step over
a mesh, parses the optimized HLO for collectives, accounts bytes per step
(collectives inside the scan-over-blocks while-loop count x num_layers),
and converts bytes to seconds with a documented ICI ring model:

    all-gather / reduce-scatter : t = full_bytes * (n-1)/n / bw_axis
    all-reduce                  : 2x the above (RS + AG)
    all-to-all                  : t = shard_bytes * (n-1)/n / bw_axis
    collective-permute          : t = shard_bytes / bw_axis

where bw_axis is the bidirectional ring bandwidth available to one mesh
axis. Public one-way per-link ICI figures (jax-ml.github.io/scaling-book):
v5e 4.5e10 B/s, v5p 9e10 B/s; a ring uses both directions, so bw_axis =
2 * link. These are nominal — the measured-vs-nominal HBM derate on this
chip was ~0.72, so the table also prints a derated column.

Usage:
    python -u tools/comm_model.py [--task t2v-14B] [--size 1280*720]
        [--frames 81] [--fsdp 2 --sp 2 --ring 2]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# virtual CPU mesh BEFORE any backend use (sitecustomize pre-imports jax,
# so env vars are too late; config updates still work)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from wanq_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS  # noqa: E402
from wanq_tpu.parallel.aot import aot_compile_step  # noqa: E402
from wanq_tpu.parallel.sharding import make_mesh  # noqa: E402
from wanq_tpu.quant.config import QuantConfig  # noqa: E402

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s4": 0.5, "u4": 0.5,
}

# one-way per-link ICI bytes/s (scaling-book public figures); a mesh axis
# mapped onto a torus ring uses both directions
ICI_LINK = {"v5e": 4.5e10, "v5p": 9.0e10}
_COLL_RE = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+(all-gather|all-reduce|reduce-scatter|"
    r"all-to-all|collective-permute)(?:-start)?\("
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_GROUPS_BRACE_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_PAIRS_RE = re.compile(r"source_target_pairs=\{")


def _shape_bytes(shape_str: str) -> float:
    """Total bytes of an HLO shape string (possibly a tuple)."""
    total = 0.0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collect_collectives(hlo: str, loop_trips: int):
    """Parse optimized HLO → [(op, group_size, bytes_per_exec, execs)].

    Computations whose name contains 'while' host the scan body — their
    collectives execute once per scan trip."""
    out = []
    for line in hlo.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        gm = _GROUPS_IOTA_RE.search(line)
        if gm:
            gsize = int(gm.group(2))  # [num_groups, group_size]<=...
        else:
            gm = _GROUPS_BRACE_RE.search(line)
            gsize = len(gm.group(1).split(",")) if gm else (
                2 if _PAIRS_RE.search(line) else 0)
        # the scan-over-blocks body shows once in HLO, runs once per layer
        execs = loop_trips if "/while/body" in line else 1
        nm = re.search(r'op_name="([^"]*)"', line)
        tag = ""
        if nm:
            parts = [p for p in nm.group(1).split("/")
                     if p and not p.startswith(("jit(", "while", "body",
                                                "closed_call", "transpose"))]
            tag = "/".join(parts[-2:])[-48:]
        out.append((op, gsize, _shape_bytes(shape_str), execs, tag))
    return out


def model_time(op: str, byts: float, gsize: int, bw_axis: float) -> float:
    n = max(gsize, 2)
    frac = (n - 1) / n
    if op == "all-gather":
        return byts * frac / bw_axis  # byts = gathered (full) output
    if op == "reduce-scatter":
        return byts * frac / bw_axis
    if op == "all-reduce":
        return 2.0 * byts * frac / bw_axis
    if op == "all-to-all":
        return byts * frac / bw_axis
    if op == "collective-permute":
        return byts / bw_axis
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="t2v-14B")
    ap.add_argument("--size", default="1280*720")
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--fsdp", type=int, default=2)
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--ring", type=int, default=2)
    ap.add_argument("--quant", default="quant_configs/wan_w8a8_14b.yaml")
    ap.add_argument("--full_shard", action="store_true", default=True)
    ap.add_argument("--keep_fp", action="store_true",
                    help="keep the FP copies of quantized weights (default "
                         "models the deployed strip_fp layout)")
    args = ap.parse_args()

    cfg = WAN_CONFIGS[args.task]
    w, h = SIZE_CONFIGS[args.size]
    lat_f = (args.frames - 1) // cfg.vae_stride[0] + 1
    lat_h, lat_w = h // cfg.vae_stride[1], w // cfg.vae_stride[2]
    mesh = make_mesh(1, args.fsdp, args.sp, args.ring)
    quant = None
    if args.quant:
        raw = dict(QuantConfig.from_yaml(args.quant).raw)
        if raw.get("act", {}).get("static_regex"):
            # static-A8 needs calibration minmax, which abstract AOT params
            # cannot provide; dynamic act quant has the identical
            # collective set (the collectives move weights and tokens, not
            # act scales) — drop the regex for comm accounting
            raw["act"] = {k: v for k, v in raw["act"].items()
                          if k != "static_regex"}
        quant = QuantConfig.from_dict(raw)

    print(f"comm_model: {args.task} {args.size} f{args.frames} "
          f"mesh fsdp{args.fsdp} x sp{args.sp} x ring{args.ring} "
          f"quant={'yes' if quant else 'no'}", flush=True)
    compiled, seq_len, _ = aot_compile_step(
        cfg, mesh, quant=quant, latent_fhw=(lat_f, lat_h, lat_w),
        full_shard=args.full_shard,
        strip_fp=quant is not None and not args.keep_fp,
    )
    hlo = compiled.as_text()
    colls = collect_collectives(hlo, loop_trips=cfg.num_layers)

    # aggregate by (op, group size)
    agg = defaultdict(lambda: [0.0, 0])
    by_tag = defaultdict(float)
    for op, gsize, byts, execs, tag in colls:
        key = (op, gsize)
        agg[key][0] += byts * execs
        agg[key][1] += execs
        by_tag[(op, tag)] += byts * execs
    total = {"v5e": 0.0, "v5p": 0.0}
    print(f"\nseq_len={seq_len}  collectives per denoise step "
          f"(scan body x{cfg.num_layers}):")
    print(f"{'op':>20} {'grp':>4} {'count':>6} {'GB/step':>9} "
          f"{'v5e ms':>8} {'v5p ms':>8}")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    for (op, gsize), (byts, cnt) in rows:
        times = {}
        for part, link in ICI_LINK.items():
            t = model_time(op, byts, gsize, 2.0 * link)
            times[part] = t
            total[part] += t
        print(f"{op:>20} {gsize:>4} {cnt:>6} {byts/1e9:>9.3f} "
              f"{times['v5e']*1e3:>8.1f} {times['v5p']*1e3:>8.1f}")
    print("\ntop sources (op_name attribution):")
    for (op, tag), byts in sorted(by_tag.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {byts/1e9:8.2f} GB  {op:>19}  {tag}")
    gb = sum(v[0] for v in agg.values()) / 1e9
    print(f"\ntotal comm: {gb:.2f} GB/step | predicted nominal: "
          f"v5e-8 {total['v5e']:.3f} s, v5p-8 {total['v5p']:.3f} s "
          f"| derated x0.72: v5e {total['v5e']/0.72:.3f} s, "
          f"v5p {total['v5p']/0.72:.3f} s")
    print("compute side (measured, BENCH_NOTES round 3): 14B 720p W8A8-full "
          "905 ms/block x 40 = 36.2 s single-chip forward; ideal /8 = 4.53 s")
    for part in ("v5e", "v5p"):
        comm = total[part] / 0.72
        comp = 36.2 / 8
        print(f"  {part}-8 predicted step (max overlap): "
              f"{max(comm, comp):.2f} s; (no overlap): {comm + comp:.2f} s; "
              f"parallel efficiency {(comp / max(comm, comp)):.0%} "
              f"(overlapped)")


if __name__ == "__main__":
    main()
