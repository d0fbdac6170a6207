"""BC3 (DXT5) block codec: BC4 alpha half + BC1 color half.

Wire format (S3TC): a 16-byte block = 8-byte BC4-style alpha block followed
by an 8-byte BC1-style color block. The color half always decodes in 4-color
mode regardless of endpoint order (S3TC rule for DXT3/5), which is why
bc1_decode_blocks is called with dxt1_punchthrough=False.

Used for Hap Alpha (Hap5) and — with the scaled-YCoCg transform
(kernels/ycocg.py) — Hap Q (HapY) frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hap_tpu.kernels.bc1 import bc1_decode_blocks, bc1_encode_blocks
from hap_tpu.kernels.bc4 import bc4_decode_blocks, bc4_encode_blocks


def bc3_decode_blocks(words: jnp.ndarray):
    """(N, 4) uint32 BC3 blocks -> (N, 16, 4) uint8 RGBA."""
    alpha = bc4_decode_blocks(words[:, 0:2])  # (N, 16)
    rgb, _ = bc1_decode_blocks(words[:, 2:4], dxt1_punchthrough=False)
    return jnp.concatenate([rgb, alpha[:, :, None]], axis=-1)


@partial(jax.jit, static_argnames=("refine_iters",))
def bc3_encode_blocks(pixels: jnp.ndarray, refine_iters: int = 2) -> jnp.ndarray:
    """(N, 16, 4) uint8 RGBA -> (N, 4) uint32 BC3 blocks."""
    alpha_words = bc4_encode_blocks(pixels[:, :, 3], refine_iters=min(refine_iters, 1))
    color_words = bc1_encode_blocks(pixels[:, :, 0:3], refine_iters=refine_iters)
    return jnp.concatenate([alpha_words, color_words], axis=1)
