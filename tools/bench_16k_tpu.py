"""16K-frame (15360x8640) Hap Q roundtrip on one TPU chip.

The reference's 16K test pack exercises 8-byte section headers and large
chunk counts (README.md:25, hap.c:398-405); this measures the same regime
on silicon: 132.7 Mpix/frame, 512 chunks, fully on-device.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import numpy as np
import jax
import jax.numpy as jnp

# 1024 chunks -> the same ~130 KB chunk shape the 4K path uses (kernel VMEM
# blocks scale with chunk size, not frame size).
H, W, CHUNKS = 8640, 15360, 1024

from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline, encode_pipeline

print("device:", jax.devices()[0], flush=True)
rng = np.random.default_rng(5)
yy = np.linspace(0, 4 * np.pi, H, dtype=np.float32)[:, None]
xx = np.linspace(0, 6 * np.pi, W, dtype=np.float32)[None, :]
img = np.stack([
    128 + 100 * np.sin(xx) * np.cos(yy),
    128 + 100 * np.broadcast_to(np.cos(xx * 0.7), (H, W)),
    128 + 100 * np.broadcast_to(np.sin(yy * 1.3), (H, W)),
], axis=-1)
img[: H // 8] = 32.0
img = np.clip(np.round(img), 0, 255).astype(np.uint8)
img = jax.device_put(jnp.asarray(img))


@jax.jit
def rt(frame):
    out, flen, ok = roundtrip_pipeline(frame, "hap_q", CHUNKS)
    return out, flen, ok, jnp.sum(out.astype(jnp.int32)) + flen + ok


t0 = time.time()
out, flen, ok, cs = rt(img)
float(cs)
print(f"compile+first: {time.time()-t0:.1f}s ok={bool(ok)} "
      f"frame={int(flen)/1e6:.1f} MB (8-byte headers: {int(flen) > 0xFFFFFF})",
      flush=True)
assert bool(ok)

ts = []
for _ in range(4):
    t0 = time.time()
    _, flen, ok, cs = rt(img)
    float(cs)
    ts.append(time.time() - t0)
dt = min(ts)
print(f"16K roundtrip: {dt*1000:.1f} ms/frame -> {H*W/dt/1e6:.1f} Mpix/s "
      f"(raw DXT {H*W*16/16/1e6:.1f} MB -> {int(flen)/1e6:.1f} MB)", flush=True)

# --- streamed serving: double-buffered single-frame dispatches ----------
# A 16K frame cannot batch into a GOP dispatch (HBM: pixels alone are
# 398 MB; 2x frames measured OOM), so the sync floor (~28 ms on this
# tunnel) is hidden the other way: keep one frame in flight and sync the
# PREVIOUS dispatch while the next is enqueued. Honest steady-state
# throughput: N distinct frames, wall clock over the whole stream.
imgs = [img]
for k in range(1, 4):
    v = np.asarray(img)
    v = np.roll(v, 97 * k, axis=1)
    v[:256] = rng.integers(0, 256, (256, W, 3), dtype=np.uint8)
    imgs.append(jax.device_put(jnp.asarray(v)))
outs = [rt(f) for f in imgs]          # warm every input binding
for o in outs:
    float(o[3])
N = 12
t0 = time.time()
pend = None
for i in range(N):
    nxt = rt(imgs[i % len(imgs)])
    if pend is not None:
        float(pend[3])                # sync frame i-1 with i in flight
    pend = nxt
float(pend[3])
dt = (time.time() - t0) / N
print(f"16K streamed (double-buffered): {dt*1000:.1f} ms/frame -> "
      f"{H*W/dt/1e6:.1f} Mpix/s over {N} frames", flush=True)
