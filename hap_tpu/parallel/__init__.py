"""Multi-chip parallelism: Mesh/shard_map sharding of the codec pipelines.

The reference's only parallelism is a caller-supplied thread callback over
chunks (hap.h:66-67,113-128; hap.c:861). Here parallelism is first-class and
TPU-shaped (SURVEY.md §2.3):

* GOP batch axis ("data"): frames are independent (all-intra format,
  HapVideoDRAFT.md:29-32), so a batch of frames shards trivially.
* Spatial axis ("space"): the 4x4-block stream of one frame is an
  embarrassingly-parallel 1-D domain; chunk boundaries align to block
  boundaries (hap.c:285-298), so each chip owns a stripe of blocks == a run
  of chunks.
* Collectives: all_gather to assemble stripes, psum for stats — riding ICI
  within a slice; multi-host via jax.distributed.
"""

from hap_tpu.parallel.mesh import make_mesh, mesh_shape_for
from hap_tpu.parallel.sharded import (
    sharded_frame_roundtrip,
    sharded_gop_encode,
    sharded_spatial_encode,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "sharded_frame_roundtrip",
    "sharded_gop_encode",
    "sharded_spatial_encode",
    "make_train_step",
]
