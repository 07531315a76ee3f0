from hybrid_ode_tpu.models.hybrid import (
    HybridConfig,
    init_hybrid_params,
    hybrid_field,
    forward,
    batched_forward,
    hybrid_loss,
    params_to_flat,
    flat_to_params,
    forward_with_params,
)
from hybrid_ode_tpu.models.protocol import (
    closed_loop_rollout,
    ensemble_closed_loop,
    glycemic_risk,
    optimize_protocol,
    time_in_range,
)
from hybrid_ode_tpu.models.bayes import (
    VariationalState,
    init_variational,
    sample_variational,
    kl_divergence,
    flatten_variational,
    posterior_predictive,
)

__all__ = [
    "HybridConfig",
    "init_hybrid_params",
    "hybrid_field",
    "forward",
    "batched_forward",
    "hybrid_loss",
    "params_to_flat",
    "flat_to_params",
    "forward_with_params",
    "closed_loop_rollout",
    "ensemble_closed_loop",
    "glycemic_risk",
    "optimize_protocol",
    "time_in_range",
    "VariationalState",
    "init_variational",
    "sample_variational",
    "kl_divergence",
    "flatten_variational",
    "posterior_predictive",
]
