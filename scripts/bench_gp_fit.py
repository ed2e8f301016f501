#!/usr/bin/env python
"""Batched GP fit/refit throughput — the fleet-learning refit barrier.

SURVEY §7 primitive 3 sketched "Pallas blocked Cholesky + batched triangular
solves" for the GP stack. The shipped design needs neither in the control
hot path: posteriors ride precomputed factors (bench.py measures ~0.25 µs
per mean+variance), so factorization cost only appears at the fleet refit
barrier — B lanes each refitting a sparse GP (kmeans inducing re-init +
FITC/VFE factor rebuild) once per learning round
(``learning/batched_learner.py:164-166``). This script measures that
barrier: vmapped ``Simple3DoFGP.fit`` over the lane axis, plus the raw
batched Cholesky it bottoms out in, at fleet shapes.

Decision record: if the vmapped XLA path sustains the refit barrier at a
small fraction of a learning round, a hand-written Pallas Cholesky has
nothing to win (the ADMM Pallas kernels already measured latency-bound
against XLA on this class of small-matrix batches — see README roofline
note). Run on the ambient TPU; CPU works for smoke.

Usage: python scripts/bench_gp_fit.py [BATCH] [REPEATS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gpmpc_tpu.gp import Simple3DoFGP, StructuredGPConfig

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_DATA = 128
N_INDUCING = 32


def main():
    key = jax.random.PRNGKey(0)

    # per-lane synthetic residual datasets (distinct per lane, realistic
    # scale: drag-like velocity residuals)
    kx, ku, kn = jax.random.split(key, 3)
    X = jax.random.uniform(
        kx, (BATCH, N_DATA, 7),
        minval=jnp.array([1.2, 0.0, -2.0, -2.0, -5.0, -1.0, -1.0]),
        maxval=jnp.array([2.0, 30.0, 2.0, 2.0, 0.0, 1.0, 1.0]),
    )
    U = jax.random.uniform(ku, (BATCH, N_DATA, 3), minval=-1.0, maxval=3.0)
    R = -0.05 * X[..., 4:7] * jnp.linalg.norm(
        X[..., 4:7], axis=-1, keepdims=True
    ) + 0.01 * jax.random.normal(kn, (BATCH, N_DATA, 3))

    gp0 = Simple3DoFGP.create(
        StructuredGPConfig(max_data_points=N_DATA, n_inducing=N_INDUCING)
    )
    gps = jax.vmap(lambda X, U, R: gp0.add_data_batch(X, U, R))(X, U, R)

    fit = jax.jit(jax.vmap(lambda gp, k: gp.fit(k)))

    def timed(label, fn, *args):
        out = fn(*args)
        anchor = jnp.sum(jax.tree.leaves(out)[0])
        _ = float(jax.device_get(anchor))
        t0 = time.time()
        for _i in range(REPEATS):
            out = fn(*args)
            anchor = jnp.sum(jax.tree.leaves(out)[0])
            _ = float(jax.device_get(anchor))
        ms = (time.time() - t0) / REPEATS * 1e3
        print(f"{label:55s} {ms:9.2f} ms  ({ms * 1e3 / BATCH:8.2f} us/lane)",
              flush=True)
        return ms

    print(f"devices={jax.devices()} batch={BATCH} "
          f"n_data={N_DATA} m_inducing={N_INDUCING}")
    refit_ms = timed(
        "fleet refit barrier (kmeans + FITC factors, vmapped)",
        lambda keys: fit(gps, keys), jax.random.split(key, BATCH),
    )

    # raw batched Cholesky at the same shapes (the primitive a Pallas kernel
    # would have to beat): the (m+n)-ish FITC system is dominated by
    # (m x m) and (n-masked) factorizations
    for n in (N_INDUCING, N_DATA):
        A = jax.random.normal(jax.random.fold_in(key, n), (BATCH, n, n))
        A = A @ jnp.swapaxes(A, -1, -2) + n * jnp.eye(n)
        chol = jax.jit(jnp.linalg.cholesky)
        timed(f"raw batched cholesky ({BATCH}x{n}x{n})", chol, A)

    # context: one learning ROUND of the fleet (episode flying) costs
    # max_steps GP-MPC cycles; print the barrier as cycles-equivalent
    print(f"refit barrier = {refit_ms:.1f} ms per round "
          f"(one 110-step learning round at 17 ms/cycle ≈ 1900 ms)")


if __name__ == "__main__":
    main()
