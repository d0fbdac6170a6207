"""JAX/Pallas block-compression kernels — the compute plane of the framework.

The reference delegates the first-stage texture codecs to out-of-repo
CPU/GPU implementations (HapVideoDRAFT.md:20-27); here they are first-class
TPU kernels: whole frames of 4x4 blocks vectorized over the leading axis so
XLA maps the per-block math onto (8,128) VPU lanes and batched matmuls onto
the MXU.
"""

from hap_tpu.kernels.layout import (
    image_to_blocks,
    blocks_to_image,
    pack_u8_to_u32,
    unpack_u32_to_u8,
)
from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks
from hap_tpu.kernels.bc3 import bc3_decode_blocks, bc3_encode_blocks
from hap_tpu.kernels.ycocg import rgb_to_cocgsy, cocgsy_to_rgb

__all__ = [
    "image_to_blocks",
    "blocks_to_image",
    "pack_u8_to_u32",
    "unpack_u32_to_u8",
    "bc1_decode_blocks",
    "bc1_encode_blocks",
    "bc4_decode_blocks",
    "bc4_encode_blocks",
    "bc3_decode_blocks",
    "bc3_encode_blocks",
    "rgb_to_cocgsy",
    "cocgsy_to_rgb",
]
