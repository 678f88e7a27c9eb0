from multimodalbrainsurvival_tpu.parallel.mesh import (
    make_mesh,
    batch_device_put,
)
from multimodalbrainsurvival_tpu.parallel.sharding import (
    joint_param_shardings,
)

__all__ = [
    "make_mesh",
    "batch_device_put",
    "joint_param_shardings",
]
