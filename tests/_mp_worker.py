"""Worker for the 2-process distributed test (tests/test_multiprocess.py).

Runs as one rank of a 2-process CPU pod (Gloo collectives through the
``jax.distributed`` coordination service) and exercises the REAL
``process_count() > 1`` branches of ``gpmpc_tpu.parallel.distributed`` —
the cross-host safe-set gather and the host-0 broadcast — asserting the
results against the single-process oracle each rank can compute locally
(both ranks build both hosts' safe sets deterministically from seeds).

Usage: _mp_worker.py <process_id> <num_processes> <coordinator_port>
"""

import sys

pid, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gpmpc_tpu.parallel.distributed import (  # noqa: E402
    broadcast_from_host0,
    gather_safe_sets_global,
    hosts_chips_mesh,
    initialize_distributed,
)

assert initialize_distributed(f"localhost:{port}", n_procs, pid)
assert jax.process_count() == n_procs, jax.process_count()
assert jax.process_index() == pid

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gpmpc_tpu.terminal.safe_set import SafeSet, merge_safe_sets  # noqa: E402

CAP = 32


def make_host_set(seed: int) -> SafeSet:
    """A deterministic per-host safe set — every rank can rebuild every
    host's set, which is what lets each rank verify the global merge."""
    rng = np.random.default_rng(seed)
    ss = SafeSet.create(CAP, 7)
    for _ in range(2):
        X = jnp.asarray(rng.normal(size=(8, 7)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        c = jnp.asarray(rng.uniform(1.0, 2.0, size=(8,)), jnp.float32)
        ss = ss.add_trajectory(X, U, c)
    return ss


# -- the mesh sees the full pod -----------------------------------------------
mesh = hosts_chips_mesh()
assert mesh.devices.shape[0] == n_procs, mesh.devices.shape

# -- cross-host safe-set gather (process_allgather + deterministic merge) -----
local = make_host_set(100 + pid)
merged = gather_safe_sets_global(local, capacity=CAP)
expected = merge_safe_sets(
    [make_host_set(100 + i) for i in range(n_procs)], capacity=CAP
)
for attr in ("states", "q_values", "controls", "fuel_required", "traj_ids"):
    np.testing.assert_allclose(
        np.asarray(getattr(merged, attr)),
        np.asarray(getattr(expected, attr)),
        rtol=1e-6, atol=1e-7, err_msg=attr,
    )
assert int(merged.count) == int(expected.count)
assert int(merged.n_trajectories) == int(expected.n_trajectories)

# -- host-0 broadcast ----------------------------------------------------------
tree = {
    "a": jnp.arange(4.0) + 100.0 * pid,
    "b": jnp.asarray(pid, jnp.int32),
}
out = broadcast_from_host0(tree)
np.testing.assert_allclose(np.asarray(out["a"]), np.arange(4.0))
assert int(out["b"]) == 0

print(f"MP_OK {pid}", flush=True)
