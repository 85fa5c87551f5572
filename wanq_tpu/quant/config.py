"""Quant-config schema + per-layer policy resolution.

The reference mutates the model tree at runtime, choosing a QuantizedLinear
subclass per layer by regex (qdiff/base/quant_model.py:15-74) and applying
mixed-precision bitwidths by regex lists (:76-105). Here the same YAML schema
is resolved *once, at model-construction time* into an immutable per-layer
``LayerPolicy`` — a static pytree of hashable dataclasses that the functional
model consumes. No module surgery, no mutation; jit sees only static policy.

YAML schema (compatible with the reference's quant_configs/config.yaml):

    remain_fp_regex: <regex or null>
    calib_data: {save_path: ...}
    weight: {n_bits: 8 | [4, 8], sym: false, gptq: false, gptq_act_order: false,
             lowrank_rank: 0}   # SVDQuant low-rank branch (quant/svd.py)
    act:    {n_bits: 8, sym: true}
    smooth_quant: {alpha: 0.5, layer_name_regex: "..."}     # optional
    quarot:       {layer_name_regex: "..."}                 # optional
    viditq:       {alpha: 0.5665, layer_name_regex: ""}     # optional
    mixed_precision:                                        # optional
      weight: {layer_name_regex: ["fp-regex", "bits0-regex", ...]}
      act:    {layer_name_regex: [...]}

Regex semantics copied from the reference: ``re.search`` (substring match),
and an *empty string* method regex matches every layer
(quant_model.py:45-53 — the shipped Wan config uses viditq.layer_name_regex
"" to enable ViDiT-Q everywhere). Empty strings inside mixed_precision lists
are skipped (quant_model.py:82).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Mapping, Optional, Tuple, Union

import yaml

from wanq_tpu.quant.quantizers import QuantizerCfg

Method = str  # 'fp' | 'base' | 'smooth_quant' | 'quarot' | 'viditq'


def _tuplify(n_bits: Any) -> Union[int, Tuple[int, ...]]:
    if isinstance(n_bits, (list, tuple)):
        return tuple(int(b) for b in n_bits)
    return int(n_bits)


@dataclasses.dataclass(frozen=True)
class LayerPolicy:
    """Immutable per-layer quantization policy (static under jit)."""

    method: Method = "fp"
    weight: Optional[QuantizerCfg] = None
    act: Optional[QuantizerCfg] = None
    alpha: float = 0.5  # smooth-quant / viditq alpha
    # mixed-precision FP16 overrides (quant_model.py:87-89, :100-102):
    # idx 0 in the regex list means "keep this layer FP"
    quant_mode: bool = True
    # Hessian-aware error-compensated weight rounding (quant/gptq.py);
    # beyond-parity — the reference always rounds to nearest. Takes effect
    # when PTQ receives a calibration Hessian for the layer (collected via
    # QuantCtx.hessian_regex / get_calib_data --collect_hessian).
    gptq: bool = False
    # desc_act refinement: quantize rows by descending Hessian diagonal
    gptq_act_order: bool = False
    # K-group size for the W4A4 route (Atom GROUP_SIZE, ref
    # csrc/qgemm/w4a4/atom.cu); only consulted when is_w4a4
    group: int = 128
    # SVDQuant-style low-rank outlier branch (quant/svd.py; beyond-parity,
    # arXiv:2411.05007): rank of the 16-bit L1@L2 split subtracted from
    # the (mask/rotation-transformed) weight before quantization; the
    # branch is re-added on the transformed activation at apply time.
    # 0 = off. YAML: weight.lowrank_rank
    lowrank: int = 0

    @property
    def is_quantized(self) -> bool:
        return self.method != "fp" and self.quant_mode

    @property
    def is_w4a4(self) -> bool:
        """Atom-style W4A4 route: 4-bit weight AND 4-bit activation, both
        group-quantized along K (ref csrc/qgemm/w4a4/atom.cu). Selected
        from YAML by weight.n_bits: 4 + act.n_bits: 4."""
        return (
            self.is_quantized
            and self.weight is not None
            and self.act is not None
            and self.weight.active_bits == 4
            and self.act.active_bits == 4
        )

    @property
    def uses_channel_mask(self) -> bool:
        return self.method in ("smooth_quant", "viditq")

    @property
    def uses_rotation(self) -> bool:
        return self.method in ("quarot", "viditq")


FP_POLICY = LayerPolicy(method="fp")


class QuantConfig:
    """Parsed quant config; resolves LayerPolicy per layer path."""

    def __init__(self, raw: Mapping[str, Any]):
        self.raw = dict(raw)
        self.remain_fp_regex: Optional[str] = raw.get("remain_fp_regex")
        cd = raw.get("calib_data") or {}
        self.calib_save_path: Optional[str] = cd.get("save_path")

        w = raw.get("weight")
        self.weight_cfg = (
            QuantizerCfg(n_bits=_tuplify(w["n_bits"]), sym=bool(w.get("sym", False)))
            if w
            else None
        )
        # weight.gptq: true enables Hessian-aware rounding for every
        # quantized layer whose calibration Hessian was collected
        self.weight_gptq: bool = bool(w.get("gptq", False)) if w else False
        self.weight_gptq_act_order: bool = (
            bool(w.get("gptq_act_order", False)) if w else False
        )
        # weight.lowrank_rank: SVDQuant low-rank branch rank (0 = off)
        self.weight_lowrank: int = int(w.get("lowrank_rank", 0)) if w else 0
        a = raw.get("act")
        self.act_cfg = (
            QuantizerCfg(
                n_bits=_tuplify(a["n_bits"]),
                sym=bool(a.get("sym", False)),
                dynamic=bool(a.get("dynamic", True)),
            )
            if a
            else None
        )
        # per-layer static-A8 selection: layers matching act.static_regex
        # use calibration-frozen per-tensor scales while the rest stay
        # dynamic per-token (the reference's StaticQuantizer +
        # quant_sum_static kernel are exactly this split, fused.cu:586)
        self.act_static_regex: Optional[str] = (
            a.get("static_regex") if a else None
        )
        # W4A4 K-group size (act.group; Atom GROUP_SIZE 128 default)
        self.act_group: int = int(a.get("group", 128)) if a else 128

        self.methods: Dict[str, Dict[str, Any]] = {}
        for m in ("smooth_quant", "quarot", "viditq"):
            if raw.get(m) is not None:
                self.methods[m] = dict(raw[m])

        self.mixed_precision: Optional[Dict[str, Any]] = raw.get("mixed_precision")

        # optional step-cache defaults tuned for this config's model scale
        # (threshold/poly/warmup/tail/cfg_interval/order — consumed by
        # cli.common.cache_policy_from_config; CLI cache flags override)
        self.cache: Optional[Dict[str, Any]] = raw.get("cache")

        # attention quantization sections (ref quant_attn.py:18-35)
        from wanq_tpu.quant.attn import AttnQuantCfg

        self.attn_cfg = AttnQuantCfg.from_dict(raw.get("attn"))
        self.cross_attn_cfg = AttnQuantCfg.from_dict(raw.get("cross_attn"))

        # resolve() runs per layer per trace — compile every selection
        # regex once here instead of on each call
        self._re_cache: Dict[str, "re.Pattern"] = {}

    def _search(self, pattern: str, name: str):
        pat = self._re_cache.get(pattern)
        if pat is None:
            pat = self._re_cache[pattern] = re.compile(pattern)
        return pat.search(name)

    @classmethod
    def from_yaml(cls, path: str) -> "QuantConfig":
        with open(path) as f:
            return cls(yaml.safe_load(f))

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "QuantConfig":
        return cls(d)

    # -- policy resolution (ref: quant_layer_refactor_, quant_model.py:15-74) --

    def resolve(self, full_name: str) -> LayerPolicy:
        """Resolve the policy for a layer path like 'blocks.0.self_attn.q'."""
        method: Method = "base"
        alpha = 0.5
        # later methods win, matching the reference's sequential overwrites
        for m in ("smooth_quant", "quarot", "viditq"):
            if m in self.methods:
                regex = self.methods[m].get("layer_name_regex", "")
                if regex is None:
                    regex = ""
                # empty regex matches everything (re.search semantics)
                if self._search(regex, full_name):
                    method = m
                    alpha = float(self.methods[m].get("alpha", alpha))

        if self.remain_fp_regex:
            if self._search(self.remain_fp_regex, full_name):
                return FP_POLICY

        w_cfg, a_cfg = self.weight_cfg, self.act_cfg
        if (
            self.act_static_regex
            and a_cfg is not None
            and a_cfg.dynamic
            and self._search(self.act_static_regex, full_name)
        ):
            a_cfg = dataclasses.replace(a_cfg, dynamic=False)
        quant_mode = True

        # mixed precision (ref: bitwidth_refactor_, quant_model.py:76-105)
        if self.mixed_precision is not None:
            w_list: List[str] = list(
                (self.mixed_precision.get("weight") or {}).get("layer_name_regex", [])
            )
            a_list: List[str] = list(
                (self.mixed_precision.get("act") or {}).get("layer_name_regex", [])
            )
            for idx, regex in enumerate(w_list):
                if len(regex) == 0:
                    continue
                if self._search(regex, full_name):
                    if idx == 0:
                        quant_mode = False
                    elif w_cfg is not None:
                        w_cfg = w_cfg.with_bitwidth(idx - 1)
            for idx, regex in enumerate(a_list):
                if len(regex) == 0:
                    continue
                if self._search(regex, full_name):
                    if idx == 0:
                        quant_mode = False
                    elif a_cfg is not None:
                        a_cfg = a_cfg.with_bitwidth(idx - 1)

        return LayerPolicy(
            method=method,
            weight=w_cfg,
            act=a_cfg,
            alpha=alpha,
            quant_mode=quant_mode,
            gptq=self.weight_gptq,
            gptq_act_order=self.weight_gptq_act_order,
            group=self.act_group,
            lowrank=self.weight_lowrank,
        )

    def resolve_all(self, layer_names: List[str]) -> Dict[str, LayerPolicy]:
        return {name: self.resolve(name) for name in layer_names}
