"""Benchmark: 4K Hap Q encode+decode throughput, one TPU chip.

Headline metric (BASELINE.md): Mpixels/s/chip for the full encode+decode
roundtrip on 4K (3840x2160) Hap Q — pixels -> complete Hap frame bytes ->
pixels, entirely on device (the flagship serving path: layout -> scaled
YCoCg -> BC3 -> chunked structured Snappy -> container, and back).

Content rigor (VERDICT r1): the GOP is 16 DISTINCT frames across three
content classes (natural / graphics / noise — tools/bench_content.py), not
one frame replicated; per-frame PSNR spread and per-dispatch timing spread
are reported, and the CPU anchor is the median of 5 runs.

Timing discipline: the axon runtime dispatches lazily, so every iteration
folds its output to a scalar fetched to the host — no un-executed work is
counted. A GOP batch is processed per dispatch to amortize the host-sync
latency, mirroring how a serving loop would drive the chip.

vs_baseline: the reference implementation (hap.c + snappy, CPU) only does
the container+Snappy byte plane — it neither encodes nor decodes textures
(hap.h:89-90). The baseline here is our native C++ runtime running exactly
that reference workload (single-threaded, like the reference's serial
encode loop hap.c:448-476) on the same DXT payloads, on this host.
Our number additionally includes the full texture codec work on the chip.

Prints ONE JSON line to stdout; detail lands in BENCH_DETAIL.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H, W = 2160, 3840
CHUNKS = 64
BATCH = 16  # distinct frames per dispatch (GOP slice)
ITERS = 8  # timed dispatches (median taken: the tunnel sync floor jitters)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hap_tpu import native
    from hap_tpu.pipeline.device_pipeline import roundtrip_pipeline
    from tools.bench_content import make_gop

    dev = jax.devices()[0]
    log(f"device: {dev}")
    batch_np = make_gop(BATCH, H, W)  # 16 distinct frames, 3 content classes
    batch = jax.device_put(jnp.asarray(batch_np), dev)

    # One dispatch = BATCH frame roundtrips + scalar fold (forces execution).
    @jax.jit
    def gop_roundtrip(frames):
        # lax.map, not vmap: a batch dim over the Pallas byte-plane kernels
        # would multiply their VMEM blocks; frames are pipelined sequentially
        # within one dispatch instead (one host sync per GOP).
        out, flen, ok = jax.lax.map(
            lambda f: roundtrip_pipeline(f, "hap_q", CHUNKS), frames
        )
        checksum = jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen) + jnp.sum(ok)
        return out, flen, ok, checksum

    t0 = time.time()
    out, flen, ok, cs = gop_roundtrip(batch)
    cs_host = float(cs)
    t_first = time.time() - t0
    flens = np.asarray(flen)
    log(
        f"compile+first run: {t_first:.1f}s ok={np.asarray(ok).tolist()} "
        f"frame_len min/med/max = {flens.min()}/{int(np.median(flens))}/{flens.max()}"
    )
    assert np.asarray(ok).all()

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        out, flen, ok, cs = gop_roundtrip(batch)
        cs_host = float(cs)  # host sync every dispatch
        times.append(time.time() - t0)
    times = sorted(times)
    dt_sync = times[ITERS // 2] / BATCH  # median: tunnel sync jitters
    log(f"on-device roundtrip (sync/GOP): {dt_sync*1000:.2f} ms/frame -> "
        f"{H*W/dt_sync/1e6:.1f} Mpix/s "
        f"(dispatch times {[f'{t*1000:.0f}' for t in times]} ms)")

    # Steady-state serving: double-buffered GOP dispatches — enqueue GOP
    # k+1 before fetching GOP k's fold, hiding the ~25-30 ms dispatch+
    # fetch floor of this tunnel exactly as a player's serving loop would.
    prev = gop_roundtrip(batch)
    ptimes = []
    for _ in range(ITERS):
        t0 = time.time()
        cur = gop_roundtrip(batch)
        _ = float(prev[3])
        prev = cur
        ptimes.append(time.time() - t0)
    _ = float(prev[3])
    ptimes = sorted(ptimes)
    dt = ptimes[ITERS // 2] / BATCH
    mpix = H * W / dt / 1e6
    log(f"on-device roundtrip (pipelined GOPs): {dt*1000:.2f} ms/frame -> "
        f"{mpix:.1f} Mpix/s "
        f"(dispatch times {[f'{t*1000:.0f}' for t in ptimes]} ms)")

    out_np = np.asarray(out)
    psnrs = []
    for i in range(BATCH):
        mse = np.mean(
            (out_np[i].astype(np.float64) - batch_np[i].astype(np.float64)) ** 2
        )
        psnrs.append(10 * np.log10(255.0**2 / max(mse, 1e-9)))
    psnrs = np.asarray(psnrs)
    cls = ["natural", "graphics", "noise"]
    per_class = {
        c: round(float(np.median(psnrs[i::3])), 2) for i, c in enumerate(cls)
    }
    log(f"Hap Q roundtrip PSNR: min/med/max = {psnrs.min():.2f}/"
        f"{np.median(psnrs):.2f}/{psnrs.max():.2f} dB, per-class {per_class}")
    log(f"frame sizes: {flens.min()/1e6:.2f}-{flens.max()/1e6:.2f} MB "
        f"(raw DXT {H*W/1e6:.2f} MB)")

    # --- baseline: reference workload (container+snappy, CPU, 1 thread) ----
    from hap_tpu.pipeline.device_pipeline import _encode_blocks
    from hap_tpu.kernels.layout import unpack_u32_to_u8

    # three payloads, one per content class; anchor = median over classes.
    # The FULL per-rep spread is recorded (VERDICT r4 item 7: the headline
    # ratio must carry its own anchor spread, not prose ranges).
    cls_names = ["natural", "graphics", "noise"]
    enc_times, dec_times = [], []
    all_enc, all_dec = [], []
    ref_container_bytes = {}
    for i in range(3):
        words = _encode_blocks("hap_q", jnp.asarray(batch_np[i]))
        payload = np.asarray(
            unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
        ).tobytes()
        reps = 5
        ts = []
        for _ in range(reps):
            t0 = time.time()
            ref_frame = native.encode([payload], [0x01], [1], [CHUNKS], n_threads=1)
            ts.append(time.time() - t0)
        enc_times.append(sorted(ts)[reps // 2])
        all_enc.extend(ts)
        ref_container_bytes[cls_names[i]] = len(ref_frame)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            ref_out, _ = native.decode(ref_frame, n_threads=1)
            ts.append(time.time() - t0)
        dec_times.append(sorted(ts)[reps // 2])
        all_dec.extend(ts)
        assert ref_out == payload
    t_enc = float(np.median(enc_times))
    t_dec = float(np.median(dec_times))
    base_mpix = H * W / (t_enc + t_dec) / 1e6
    log(f"baseline (reference workload, CPU 1-thread container+snappy, "
        f"median of 5x3 classes): enc {t_enc*1000:.1f} ms + dec "
        f"{t_dec*1000:.1f} ms -> {base_mpix:.1f} Mpix/s")

    # --- bytes vs reference (VERDICT r4 job #1 'Done' column): device
    # container bytes / reference (hap.c + google snappy) container bytes
    # on the same content, per class. The GOP cycles classes i%3.
    bytes_vs_ref = {}
    for i, c in enumerate(cls_names):
        dev_med = float(np.median(flens[i::3]))
        bytes_vs_ref[c] = round(dev_med / ref_container_bytes[c], 3)
    log(f"bytes vs reference containers (device/ref): {bytes_vs_ref}")

    # --- multithreaded anchor: the reference's design intent is threaded
    # chunk decode (hap.h:93,113-116); beating only its serial mode is not
    # beating the reference. Same payloads through the C++ runtime's
    # thread pool on every core of this host.
    ncpu = os.cpu_count() or 1
    enc_mt, dec_mt = [], []
    all_enc_mt, all_dec_mt = [], []
    for i in range(3):
        words = _encode_blocks("hap_q", jnp.asarray(batch_np[i]))
        payload = np.asarray(
            unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
        ).tobytes()
        reps = 5
        ts = []
        for _ in range(reps):
            t0 = time.time()
            ref_frame = native.encode([payload], [0x01], [1], [CHUNKS],
                                      n_threads=ncpu)
            ts.append(time.time() - t0)
        enc_mt.append(sorted(ts)[reps // 2])
        all_enc_mt.extend(ts)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            ref_out, _ = native.decode(ref_frame, n_threads=ncpu)
            ts.append(time.time() - t0)
        dec_mt.append(sorted(ts)[reps // 2])
        all_dec_mt.extend(ts)
        assert ref_out == payload
    t_enc_mt = float(np.median(enc_mt))
    t_dec_mt = float(np.median(dec_mt))
    base_mt_mpix = H * W / (t_enc_mt + t_dec_mt) / 1e6
    log(f"baseline (reference workload, CPU {ncpu}-thread chunk pool): "
        f"enc {t_enc_mt*1000:.1f} ms + dec {t_dec_mt*1000:.1f} ms -> "
        f"{base_mt_mpix:.1f} Mpix/s")

    detail = {
        "config": {"H": H, "W": W, "chunks": CHUNKS, "batch": BATCH,
                   "content": "16 distinct frames, classes natural/graphics/noise",
                   "second_stage": "device LZ snappy (HAP_TPU_DEVICE_LZ=1)"},
        "ms_per_frame": {"median": round(dt * 1000, 2),
                         "median_sync_per_gop": round(dt_sync * 1000, 2),
                         "min": round(ptimes[0] * 1000 / BATCH, 2),
                         "max": round(ptimes[-1] * 1000 / BATCH, 2)},
        "psnr_db": {"min": round(float(psnrs.min()), 2),
                    "median": round(float(np.median(psnrs)), 2),
                    "max": round(float(psnrs.max()), 2),
                    "per_class": per_class},
        "frame_mb": {"min": round(float(flens.min()) / 1e6, 2),
                     "max": round(float(flens.max()) / 1e6, 2)},
        "bytes_vs_reference": bytes_vs_ref,
        "cpu_anchor_ms": {"encode": round(t_enc * 1000, 1),
                          "decode": round(t_dec * 1000, 1),
                          # per-rep spread across 5 reps x 3 classes: the
                          # vs_baseline ratio carries this host-side noise
                          "encode_spread": [round(min(all_enc) * 1000, 1),
                                            round(max(all_enc) * 1000, 1)],
                          "decode_spread": [round(min(all_dec) * 1000, 1),
                                            round(max(all_dec) * 1000, 1)]},
        "cpu_anchor_mt_ms": {"encode": round(t_enc_mt * 1000, 1),
                             "decode": round(t_dec_mt * 1000, 1),
                             "threads": ncpu,
                             "encode_spread": [round(min(all_enc_mt) * 1000, 1),
                                               round(max(all_enc_mt) * 1000, 1)],
                             "decode_spread": [round(min(all_dec_mt) * 1000, 1),
                                               round(max(all_dec_mt) * 1000, 1)]},
        # Warm-start story (VERDICT r4 item 8): first dispatch cost with
        # the persistent JAX cache in whatever state it was in. A cold
        # cache costs minutes; tools/warm_cache.py pre-populates it for a
        # declared serving shape set so a fresh server pays reload, not
        # compile.
        "first_dispatch_s": round(t_first, 1),
        "compilation_cache": os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", ""),
    }

    # --- foreign-frame serving (real HapEncode streams, GOP session) ------
    foreign_mpix = None
    if os.environ.get("BENCH_FOREIGN", "1") == "1":
        try:
            from hap_tpu import oracle
            from hap_tpu.pipeline.any_frame import ForeignGopSession
            from hap_tpu.constants import TextureFormat

            from tools.bench_content import make_frame

            fgop = 8
            frames = []
            for k in range(fgop):  # graphics class = worst measured
                img_k = make_frame("graphics", k, H, W)
                words = _encode_blocks("hap_q", jnp.asarray(img_k))
                pay = np.asarray(
                    unpack_u32_to_u8(words.reshape(1, -1)).reshape(-1)
                ).tobytes()
                frames.append(oracle.encode(
                    [pay], [int(TextureFormat.YCoCg_DXT5)], [1], [CHUNKS]))
            sess = ForeignGopSession(H, W)
            staged = [sess.stage(f) for f in frames]
            pix, okg = sess.decode_gop(staged)
            _ = float(jnp.sum(pix.astype(jnp.int32)) + jnp.sum(okg))
            assert np.asarray(okg).all()
            fts = []
            for _ in range(5):
                t0 = time.time()
                pix, okg = sess.decode_gop(staged)
                _ = float(jnp.sum(pix.astype(jnp.int32)) + jnp.sum(okg))
                fts.append(time.time() - t0)
            fdt = sorted(fts)[2] / fgop
            foreign_mpix = H * W / fdt / 1e6
            log(f"foreign serving (real HapEncode frames, {fgop}-frame GOP): "
                f"{fdt*1000:.1f} ms/frame -> {foreign_mpix:.1f} Mpix/s")
            detail["foreign_gop"] = {"ms_per_frame": round(fdt * 1000, 2),
                                     "mpix_s": round(foreign_mpix, 1),
                                     "gop": fgop}
        except Exception as e:  # oracle toolchain missing etc.
            log(f"foreign serving row skipped: {e}")

    # --- continuity row: the r4 profile (no second-stage LZ; structured
    # RLE emitter, raw fallback on real content). Requires retracing with
    # the profile flag flipped; labeled for what it is — a roundtrip that
    # SKIPS real compression work (the r4 verdict's job #1 finding).
    no2_mpix = None
    if os.environ.get("BENCH_NO2", "1") == "1":
        try:
            os.environ["HAP_TPU_DEVICE_LZ"] = "0"
            jax.clear_caches()

            @jax.jit
            def gop_roundtrip_no2(frames):
                out, flen, ok = jax.lax.map(
                    lambda f: roundtrip_pipeline(f, "hap_q", CHUNKS), frames
                )
                checksum = (jnp.sum(out.astype(jnp.int32)) + jnp.sum(flen)
                            + jnp.sum(ok))
                return out, flen, ok, checksum

            prev = gop_roundtrip_no2(batch)
            _ = float(prev[3])
            nts = []
            for _ in range(4):
                t0 = time.time()
                cur = gop_roundtrip_no2(batch)
                _ = float(prev[3])
                prev = cur
                nts.append(time.time() - t0)
            _ = float(prev[3])
            ndt = sorted(nts)[len(nts) // 2] / BATCH
            no2_mpix = H * W / ndt / 1e6
            nflens = np.asarray(prev[1])
            log(f"no-second-stage profile (RLE/raw, r4 continuity): "
                f"{ndt*1000:.2f} ms/frame -> {no2_mpix:.1f} Mpix/s, "
                f"frames {nflens.min()/1e6:.2f}-{nflens.max()/1e6:.2f} MB")
            detail["no_second_stage"] = {
                "ms_per_frame": round(ndt * 1000, 2),
                "mpix_s": round(no2_mpix, 1),
                "frame_mb_max": round(float(nflens.max()) / 1e6, 2),
                "note": "r4-profile roundtrip (stores raw on real content); "
                        "kept for continuity — the honest headline is the "
                        "compression-on number above",
            }
            os.environ["HAP_TPU_DEVICE_LZ"] = "1"
        except Exception as e:
            log(f"no-second-stage row skipped: {e}")

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    row = {
        "metric": "Mpixels/s/chip encode+decode (4K Hap Q, on-device roundtrip incl. real second-stage compression, 16 distinct frames, pipelined GOP serving)",
        "value": round(mpix, 1),
        "unit": "Mpixels/s",
        # headline ratio vs the THREADED reference workload (its design
        # intent, hap.h:93); the serial ratio is kept alongside.
        "vs_baseline": round(mpix / base_mt_mpix, 3),
        "vs_baseline_1t": round(mpix / base_mpix, 3),
        "vs_baseline_mt": round(mpix / base_mt_mpix, 3),
        "bytes_vs_reference": bytes_vs_ref,
    }
    if foreign_mpix is not None:
        row["foreign_gop_mpix_s"] = round(foreign_mpix, 1)
    if no2_mpix is not None:
        row["no_second_stage_mpix_s"] = round(no2_mpix, 1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
