from hybrid_ode_tpu.ops.pallas_rk4 import fused_rk4_trajectory, pallas_available

__all__ = ["fused_rk4_trajectory", "pallas_available"]
