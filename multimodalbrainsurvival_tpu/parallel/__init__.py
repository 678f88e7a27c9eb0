from multimodalbrainsurvival_tpu.parallel.mesh import (
    make_mesh,
    batch_device_put,
    host_to_global,
)
from multimodalbrainsurvival_tpu.parallel.sharding import (
    joint_param_shardings,
)

__all__ = [
    "make_mesh",
    "batch_device_put",
    "host_to_global",
    "joint_param_shardings",
]
