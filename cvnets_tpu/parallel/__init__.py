"""Device mesh + GSPMD sharding utilities.

Replaces the reference's DDP/NCCL plumbing (reference utils/ddp_utils.py,
main_train.py:261-265 process spawn) with a single-program model: one python process
per host, a `jax.sharding.Mesh` over all devices, batch sharded along the ``data``
axis, params replicated. GSPMD inserts the psums that DDP's allreduce used to do.
"""

from cvnets_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    device_prefetch,
    get_active_mesh,
    replicated_sharding,
    set_active_mesh,
    shard_batch,
)
