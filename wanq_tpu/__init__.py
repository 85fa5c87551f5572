"""wanq_tpu — TPU-native (JAX/XLA/Pallas/pjit) post-training-quantization framework
for the Wan2.1 text-to-video diffusion transformer.

A ground-up rebuild of the capabilities of BillHan01/wan2.1-quantization
(ViDiT-Q methodology applied to Wan2.1): full-precision generation, calibration
over denoise timesteps, PTQ (static per-output-channel weight quant + dynamic
per-token activation quant, SmoothQuant channel scaling, QuaRot Hadamard
rotation, regex-driven mixed precision), and quantized inference with Pallas
int8 MXU GEMM kernels.

Layer map (mirrors SURVEY.md of the reference):
  ops/        Pallas kernels + jnp reference ops       (ref: kernels/csrc)
  quant/      quantization framework                   (ref: quant_utils/qdiff)
  models/     Wan2.1 model stack in JAX                (ref: wan/modules)
  parallel/   mesh / GSPMD sharding / Ulysses          (ref: wan/distributed)
  pipelines/  generation pipelines                     (ref: wan/text2video.py)
  solvers/    flow-matching solvers                    (ref: wan/utils/fm_solvers*)
  configs/    model configs                            (ref: wan/configs)
  cli/        entry points                             (ref: examples/Wan2.1/*.py)
"""

__version__ = "0.1.0"
