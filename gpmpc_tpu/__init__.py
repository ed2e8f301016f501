"""gpmpc_tpu — TPU-native GP-MPC rocket-landing engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
GP-MPC rocket-landing stack (see SURVEY.md): 3-DoF / 6-DoF powered-descent
dynamics, structured Gaussian-process residual learning, nominal / GP-augmented
/ real-time-iteration MPC on a single batched QP solver, predictive safety
filtering, LMPC with sampled safe sets, online learning, and a Monte-Carlo
experiment suite — all designed TPU-first: pure functions, `vmap` over the
scenario axis, `lax.scan` over time, `jax.sharding` meshes across chips.

Subpackages
-----------
- ``dynamics``    rocket models, integrators, linearization
- ``ops``         batched QP solvers (ADMM / PDIP), linear algebra, kNN, k-means
- ``gp``          kernels, exact/sparse GPs, features, structured residual GP
- ``mpc``         constraints, costs, nominal/GP/RTI MPC, uncertainty propagation
- ``safety``      predictive safety filter, backup controllers, invariant sets
- ``terminal``    sampled safe sets, local (kNN) safe sets, convex hulls, Q-functions
- ``lmpc``        learning MPC controller
- ``reference``   SCVX trajectory optimization, trajectory library
- ``learning``    online learning loop, data management, novelty selection, tuning
- ``experiments`` Monte-Carlo campaigns, baselines, dispersion, ablation, analysis
- ``parallel``    device meshes, sharded campaigns, collectives
- ``utils``       profiling, config loading, checkpointing
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16 inputs, which collapses the ADMM/Cholesky
# numerics (solver residuals floor ~1e-2 and nothing converges). All compute
# paths here are engineered for f32; pin the matmul precision accordingly.
# Override after import (or via JAX_DEFAULT_MATMUL_PRECISION) if a caller
# really wants bf16 for throughput experiments.
_jax.config.update("jax_default_matmul_precision", "float32")
