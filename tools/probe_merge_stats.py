"""How much does parse-time run-merging shrink the element stream?

Real HapEncode streams split long matches into max-64-byte copies
(google snappy's emitter), so consecutive copies with the SAME offset are
one logical long copy (vertical-match rows at off = row stride, RLE fills
at off < 8). This probe parses the bench-content streams and reports the
op count after merging consecutive same-offset copies and after folding
each op to 128-byte execute iterations — the iteration count of a
parse/execute-split kernel (see pallas_general.py redesign). CPU-only.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

H, W = 2160, 3840
CHUNKS = 64


def parse_ops(stream: bytes):
    """-> list of (kind, m, off) ops: kind 0=literal, 1=copy."""
    from hap_tpu.snappy.format import read_varint

    view = memoryview(stream)
    n = len(view)
    _, pos = read_varint(view, 0)
    ops = []
    while pos < n:
        tag = view[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(view[pos:pos + extra], "little") + 1
                pos += extra
            pos += length
            ops.append((0, length, 0))
        else:
            if kind == 1:
                length = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | view[pos]
                pos += 1
            elif kind == 2:
                length = (tag >> 2) + 1
                off = view[pos] | (view[pos + 1] << 8)
                pos += 2
            else:
                length = (tag >> 2) + 1
                off = int.from_bytes(view[pos:pos + 4], "little")
                pos += 4
            ops.append((1, length, off))
    return ops


def merge_ops(ops):
    """Merge consecutive same-kind ops (copies: same off and the PRIOR copy
    reached its own src+len == next src, which for equal off is automatic;
    overlap runs stay correct: period off fill just continues)."""
    merged = []
    for kind, m, off in ops:
        if merged and merged[-1][0] == kind and (kind == 0 or merged[-1][2] == off):
            merged[-1][1] += m
        else:
            merged.append([kind, m, off])
    return merged


def main():
    import jax.numpy as jnp

    from hap_tpu import oracle
    from hap_tpu.constants import CHUNK_COMPRESSOR_SNAPPY, TextureFormat
    from hap_tpu.container.parse import parse_frame
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import unpack_u32_to_u8
    from tools.bench_content import make_frame

    for cls in ("graphics", "natural", "noise"):
        img = make_frame(cls, 0, H, W)
        words = _encode_blocks("hap_q", jnp.asarray(img))
        payload = np.asarray(
            unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
        ).tobytes()
        frame = oracle.encode(
            [payload], [int(TextureFormat.YCoCg_DXT5)], [1], [CHUNKS])
        plan = parse_frame(frame)
        tex = plan.textures[0]
        frame_np = np.frombuffer(frame, np.uint8)
        raw_n = 0
        merged_n = 0
        iters = 0          # merged ops folded to 128 B execute steps
        far = 0            # iterations whose copy source is > 384 B back
        max_chain_iters = 0
        for i in range(tex.chunk_count):
            if tex.chunk_compressors[i] != CHUNK_COMPRESSOR_SNAPPY:
                continue
            off = tex.chunk_compressed_offsets[i]
            sz = tex.chunk_compressed_sizes[i]
            ops = parse_ops(frame_np[off:off + sz].tobytes())
            raw_n += len(ops)
            m = merge_ops(ops)
            merged_n += len(m)
            ci = 0
            for kind, length, o in m:
                it = -(-length // 128)
                ci += it
                if kind == 1 and o > 384:
                    far += it
            iters += ci
            max_chain_iters = max(max_chain_iters, ci)
        print(f"{cls}: raw elems {raw_n} -> merged ops {merged_n} "
              f"(x{raw_n/max(merged_n,1):.1f}), execute iters {iters} "
              f"(far-src {far}, {100*far/max(iters,1):.0f}%), "
              f"max chain iters {max_chain_iters}")


if __name__ == "__main__":
    main()
