"""hap_tpu — a TPU-native Hap codec framework.

Built from scratch in JAX/XLA/Pallas with a native C++ byte-plane runtime.
See SURVEY.md for the structural analysis of the reference
(/root/reference, Vidvox/hap) this framework re-implements TPU-first.

Layers:
  hap_tpu.container  — host byte codec: frame plans in, frames out
  hap_tpu.snappy     — Snappy second-stage codec (pyref / native / device)
  hap_tpu.kernels    — JAX/Pallas BC1/BC3/BC4/BC7/BC6H + YCoCg block kernels
  hap_tpu.native     — C++ runtime (snappy, container, chunk thread pool)
  hap_tpu.pipeline   — end-to-end jitted encode/decode pipelines
  hap_tpu.parallel   — Mesh/shard_map GOP-batch and frame-stripe sharding
  hap_tpu.api        — public API mirroring the reference's 6-function surface
"""

__version__ = "0.1.0"

from hap_tpu.constants import Compressor, HapError, HapResult, TextureFormat

__all__ = ["Compressor", "HapError", "HapResult", "TextureFormat", "__version__"]
