"""Pallas kernels + XLA reference ops (TPU-native rebuild of kernels/csrc)."""

from wanq_tpu.ops.qgemm import w8a8_linear, w8a8_linear_pallas, w8a8_linear_xla
