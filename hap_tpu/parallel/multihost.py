"""Multi-host execution: jax.distributed runtime + cross-host GOP/stripe

sharding. The reference is a single-process library (SURVEY.md §2.3: no
NCCL/MPI/anything); here scaling across hosts is first-class: each host
contributes its local devices to one global Mesh, frames (GOP batch) shard
over the global "data" axis, frame stripes over "space", and the encoded
streams ride ICI within a slice / DCN across hosts via the same collectives
as the single-host path (all_gather at stitch points, psum for stats).

Test strategy (SURVEY.md §4): CPU processes with
jax.distributed.initialize + xla_force_host_platform_device_count stand in
for hosts — semantics are identical; only the transport differs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from hap_tpu.parallel.mesh import make_mesh, mesh_shape_for
from hap_tpu.parallel.sharded import make_train_step


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: Optional[int] = None,
) -> None:
    """Join the distributed runtime. Call before any other JAX operation."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=(
            list(range(local_device_count)) if local_device_count else None
        ),
    )


def global_mesh(axis_names: Tuple[str, str] = ("data", "space")):
    """Mesh over every device of every process (ICI within, DCN across)."""
    devices = jax.devices()
    shape = mesh_shape_for(len(devices))
    return make_mesh(devices, shape, axis_names)


def run_multihost_step(codec: str = "hap_q", frames_per_device: int = 1, seed: int = 0):
    """One full sharded encode+decode step over the global mesh.

    Returns (words shape, sse, n_devices). Every process must call this with
    the same arguments (SPMD). Used by tools/multihost_worker.py and the
    scaling benchmark.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh()
    dp, sp = mesh.devices.shape
    batch = dp * frames_per_device
    nblocks = 16 * sp  # divisible by the space axis
    rng = np.random.default_rng(seed)
    host_blocks = rng.integers(0, 256, (batch, nblocks, 16, 3), dtype=np.uint8)

    sharding = NamedSharding(mesh, P("data", "space"))
    blocks = jax.make_array_from_process_local_data(sharding, host_blocks)
    step = make_train_step(mesh, codec)
    words, sse = step(blocks)
    jax.block_until_ready(words)
    return tuple(words.shape), float(sse), len(jax.devices())


def run_multihost_spatial(
    codec: str = "hap_q",
    height: int = 32,
    width: int = 64,
    chunk_count: int = 8,
    seed: int = 0,
):
    """One frame spatially sharded across ALL hosts' devices, full pipeline.

    Every process feeds its stripe of the 4x4-block stream; per-chunk snappy
    streams all_gather across the process boundary (DCN in a real pod) and
    every device assembles the identical container. Returns
    (frame_len, ok, frame_crc32) — identical on every process, and the frame
    is additionally cross-checked bit-exact against a process-local
    single-device encode_pipeline run.
    """
    import zlib

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hap_tpu.kernels.layout import image_to_blocks
    from hap_tpu.parallel.sharded import sharded_spatial_roundtrip
    from hap_tpu.pipeline.device_pipeline import encode_pipeline

    mesh = global_mesh()
    rng = np.random.default_rng(seed)  # identical content on every process
    img = np.broadcast_to(
        np.linspace(0, 255, width, dtype=np.uint8)[None, :, None],
        (height, width, 3),
    ).copy()
    img[: height // 4] = rng.integers(
        0, 256, (height // 4, width, 3), dtype=np.uint8
    )

    blocks_full = np.asarray(image_to_blocks(jnp.asarray(img)))
    nproc = jax.process_count()
    pid = jax.process_index()
    lo = pid * blocks_full.shape[0] // nproc
    hi = (pid + 1) * blocks_full.shape[0] // nproc
    sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    blocks = jax.make_array_from_process_local_data(
        sharding, blocks_full[lo:hi], blocks_full.shape
    )

    rt = sharded_spatial_roundtrip(mesh, height, width, codec, chunk_count)
    out_blocks, frame, flen, ok = rt(blocks)
    flen_i, ok_b = int(jax.device_get(flen)), bool(jax.device_get(ok))
    frame_np = np.asarray(jax.device_get(frame))[:flen_i]

    # Cross-check: local single-device encode must produce the same bytes.
    ref, ref_len = jax.jit(
        lambda x: encode_pipeline(x, codec, chunk_count)
    )(jnp.asarray(img))
    assert int(ref_len) == flen_i
    assert bytes(np.asarray(ref)[:flen_i]) == bytes(frame_np)
    return flen_i, ok_b, zlib.crc32(bytes(frame_np))
