"""Element statistics of real HapEncode (google snappy) streams.

Parses the snappy chunk streams of the bench content frames and histograms
elements: literal vs copy, overlap (off < len, needs period extension),
off == 1 (pure RLE), lengths. These frequencies decide which general-kernel
optimization pays (snappy/pallas_general.py). CPU-only.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

H, W = 2160, 3840
CHUNKS = 64


def element_stats(stream: bytes):
    from hap_tpu.snappy.format import read_varint

    view = memoryview(stream)
    n = len(view)
    out_len, pos = read_varint(view, 0)
    op = 0
    st = dict(lit=0, lit_bytes=0, lit_iters=0, cp=0, cp_bytes=0,
              overlap=0, off1=0, off_ge_len=0, elems=0)
    offs = []
    lens = []
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
            op += length
            st["lit"] += 1
            st["lit_bytes"] += length
            st["lit_iters"] += -(-length // 128)
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
            op += length
            st["cp"] += 1
            st["cp_bytes"] += length
            offs.append(off)
            lens.append(length)
            if off < length:
                st["overlap"] += 1
            if off == 1:
                st["off1"] += 1
            if off >= length:
                st["off_ge_len"] += 1
        st["elems"] += 1
    assert op == out_len
    st["offs"] = offs
    st["lens"] = lens
    return st


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
        tot = dict(lit=0, lit_bytes=0, lit_iters=0, cp=0, cp_bytes=0,
                   overlap=0, off1=0, off_ge_len=0, elems=0)
        all_offs = []
        all_lens = []
        nsnappy = 0
        max_chain = 0
        for i in range(tex.chunk_count):
            if tex.chunk_compressors[i] != CHUNK_COMPRESSOR_SNAPPY:
                continue
            nsnappy += 1
            off = tex.chunk_compressed_offsets[i]
            sz = tex.chunk_compressed_sizes[i]
            st = element_stats(frame_np[off:off + sz].tobytes())
            all_offs.extend(st.pop("offs"))
            all_lens.extend(st.pop("lens"))
            iters = st["lit_iters"] + st["cp"]
            max_chain = max(max_chain, iters)
            for k in tot:
                tot[k] += st[k]
        it = tot["lit_iters"] + tot["cp"]
        print(f"{cls}: snappy chunks {nsnappy}, elems {tot['elems']} "
              f"(lit {tot['lit']} / cp {tot['cp']}), kernel iters {it} "
              f"(lit {tot['lit_iters']} + cp {tot['cp']}), max chain {max_chain}")
        print(f"  lit bytes {tot['lit_bytes']} cp bytes {tot['cp_bytes']}; "
              f"copies: overlap {tot['overlap']} "
              f"({100*tot['overlap']/max(tot['cp'],1):.1f}%), off1 {tot['off1']}, "
              f"off>=len {tot['off_ge_len']}")
        if all_offs:
            o = np.asarray(all_offs)
            ln = np.asarray(all_lens)
            pct = [50, 90, 99]
            print(f"  copy off percentiles {dict(zip(pct, np.percentile(o, pct).astype(int).tolist()))}, "
                  f"len percentiles {dict(zip(pct, np.percentile(ln, pct).astype(int).tolist()))}")
            for thr in (64, 128, 256, 384, 512, 1024):
                print(f"    off<={thr}: {100*np.mean(o <= thr):.1f}%", end="")
            print()
            print(f"    off mod 4 == 0: {100*np.mean(o % 4 == 0):.1f}%  "
                  f"mod 8: {100*np.mean(o % 8 == 0):.1f}%  "
                  f"len mod 4: {100*np.mean(ln % 4 == 0):.1f}%  "
                  f"elem avg out bytes "
                  f"{(tot['lit_bytes']+tot['cp_bytes'])/max(tot['elems'],1):.1f}")


if __name__ == "__main__":
    main()
