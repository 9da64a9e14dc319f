"""Device-mesh parallelism: mesh construction, shardings, collectives.

The reference's distributed story is at most single-process
``nn.DataParallel`` over NCCL (SURVEY §2.17). TPU-native replacement:
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI/DCN.
"""

from basi_tpu.parallel.mesh import make_mesh, local_batch_size  # noqa: F401
