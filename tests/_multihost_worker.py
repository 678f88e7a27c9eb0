"""Worker for the two-process jax.distributed smoke test (test_parallel.py).

Each process initializes the distributed runtime via the library's own
``initialize_distributed`` wrapper (parallel/mesh.py), builds the SAME
``make_mesh`` the single-host code uses — now spanning both processes —
and runs one jitted cross-process reduction through it. This is the
multi-host DCN path of SURVEY.md §2.2 exercised for real (two OS processes,
one coordinator), not prose.

Usage: python _multihost_worker.py <process_id> <num_processes> <coord_addr>
"""

import os
import sys

# self-sufficient import: the worker must find the package even if the
# editable install is absent in this interpreter (observed: the venv's
# site-packages can be recreated under this container)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    process_id, num_processes, coord = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    )
    from multimodalbrainsurvival_tpu.parallel import make_mesh
    from multimodalbrainsurvival_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == num_processes  # 1 CPU device per process

    mesh = make_mesh(dp=num_processes, mp=1)
    sharding = NamedSharding(mesh, P("dp"))

    # each process contributes its own shard of a global dp-sharded array
    local = np.full((1,), float(process_id + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expected = num_processes * (num_processes + 1) / 2
    np.testing.assert_allclose(jax.device_get(total), expected)
    print(f"MULTIHOST OK pid={process_id} total={float(total)}", flush=True)


if __name__ == "__main__":
    main()
