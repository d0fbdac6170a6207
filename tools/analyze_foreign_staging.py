"""Host-side analysis of foreign-frame staging volume (no TPU needed).

Round-3 finding (VERDICT): fresh-frame foreign serving is staging-bound —
natural-class GOPs staged 134 MB for 8 frames. This tool decomposes the
staged bytes (op tables / literal plane / raw rows / aux) per content
class and promotion policy so the staging fix optimizes the right term.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_foreign_staging.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    from hap_tpu import oracle
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY, TextureFormat
    from hap_tpu.container.parse import parse_frame
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import unpack_u32_to_u8
    from hap_tpu.snappy.optable import pack_tables
    from tools.bench_content import make_frame

    H, W, CHUNKS = 2160, 3840, 64
    for cls in ("graphics", "natural", "noise"):
        img = make_frame(cls, 0, H, W)
        words = _encode_blocks("hap_q", jnp.asarray(img))
        pay = np.asarray(unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
                         ).tobytes()
        frame = oracle.encode([pay], [int(TextureFormat.YCoCg_DXT5)], [1],
                              [CHUNKS])
        plan = parse_frame(frame)
        tex = plan.textures[0]
        frame_np = np.frombuffer(frame, np.uint8)
        csizes = np.asarray(tex.chunk_compressed_sizes, np.int64)
        usizes = np.asarray(tex.chunk_uncompressed_sizes, np.int64)
        is_comp = np.asarray(tex.chunk_compressors) == CHUNK_COMPRESSOR_SNAPPY
        S_max = int(usizes.max())
        streams, exp = [], []
        for i in range(len(csizes)):
            if is_comp[i]:
                o = int(tex.chunk_compressed_offsets[i])
                streams.append(frame_np[o:o + int(csizes[i])].tobytes())
                exp.append(int(usizes[i]))
            else:
                streams.append(b"")
                exp.append(0)
        raw_bytes = int(csizes[~is_comp].sum())
        print(f"\n== {cls}: frame {len(frame)/1e6:.2f} MB, payload "
              f"{len(pay)/1e6:.2f} MB, snappy {is_comp.sum()}/{len(csizes)} "
              f"chunks, raw bytes {raw_bytes/1e6:.2f} MB, S_max {S_max}")
        for pm in (0, 64, 128):
            p = pack_tables(streams, exp, S_max=S_max, promote_max=pm)
            n_pieces = int(p.n_ops.sum())
            # staged-as-today: dense padded arrays
            dense_rr = len(csizes) * S_max if not is_comp.all() else 0
            staged_dense = p.ops.nbytes + p.lit.nbytes + dense_rr
            # staged-packed: true literal bytes + true table rows + raw bytes
            lit_true = int(p.n_lit.sum())
            ops_true = int(p.n_ops.sum()) * 8
            staged_packed = ops_true + lit_true + raw_bytes
            print(f"  promote_max={pm:3d}: pieces {n_pieces:8d}  "
                  f"lit {lit_true/1e6:7.2f} MB  tables {ops_true/1e6:6.2f} MB"
                  f"  staged dense(today) {staged_dense/1e6:7.2f} MB  "
                  f"packed(min) {staged_packed/1e6:7.2f} MB")


if __name__ == "__main__":
    main()
