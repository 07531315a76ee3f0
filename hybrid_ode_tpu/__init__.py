"""hybrid_ode_tpu — TPU-native hybrid ODE–NN framework for GLP-1/glucose dynamics.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo `OliverDOU776/Hybrid-ODE-for-GLP-1-and-Glucose` (a PyTorch + SciPy research
codebase). Nothing here is a translation: the reference's Python-serial,
gradient-free SciPy integration loop (reference `models/hybrid_ode_nn.py:184-241`)
is replaced by a fully jittable, differentiable, batch-vmappable solver suite;
its per-sample Python loops become `vmap` axes; multi-chip scaling is expressed
with `jax.sharding` meshes instead of not existing at all.

Layering (bottom-up):
  dynamics/   pure vector fields (mechanistic 6-state core, MLP residual, 4GI sim)
  solvers/    adaptive explicit RK (dopri5/dop853/bosh3), implicit Radau-IIA,
              fixed-grid RK4; scan (differentiable) and while (fast) modes
  models/     hybrid model composition, losses, variational-parameter pytrees
  ops/        Pallas TPU kernels for the hot fused RHS path
  parallel/   mesh construction + sharded (data-parallel) train/sim steps
  data/       4GI cohort generator, CSV/Parquet windowing, MIMIC pipeline
  train/      optax training loop, checkpointing, CLI
  inference/  variational inference (working ELBO) and vectorized NUTS
  evals/      metric suite (RMSE/MAE/calibration/coverage/...)
  plots/      figures, Sobol sensitivity (native Saltelli), tables
  utils/      config, checkpoint, tree utilities
"""

__version__ = "0.1.0"

from hybrid_ode_tpu.dynamics.ode_core import (
    DEFAULT_ODE_PARAMS,
    mechanistic_field,
    steady_state,
)
from hybrid_ode_tpu.dynamics.residual import init_mlp_params, mlp_apply
from hybrid_ode_tpu.solvers.api import odeint
from hybrid_ode_tpu.models.hybrid import (
    HybridConfig,
    init_hybrid_params,
    hybrid_field,
    forward,
    batched_forward,
    hybrid_loss,
)

__all__ = [
    "DEFAULT_ODE_PARAMS",
    "mechanistic_field",
    "steady_state",
    "init_mlp_params",
    "mlp_apply",
    "odeint",
    "HybridConfig",
    "init_hybrid_params",
    "hybrid_field",
    "forward",
    "batched_forward",
    "hybrid_loss",
]
