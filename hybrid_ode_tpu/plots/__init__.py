from hybrid_ode_tpu.plots.sobol import saltelli_sample, sobol_analyze, sobol_sensitivity
from hybrid_ode_tpu.plots.figures import (
    plot_fig1_predictions,
    plot_fig2_sensitivity,
    plot_fig3_posterior_bands,
    generate_performance_tables,
)

__all__ = [
    "saltelli_sample",
    "sobol_analyze",
    "sobol_sensitivity",
    "plot_fig1_predictions",
    "plot_fig2_sensitivity",
    "plot_fig3_posterior_bands",
    "generate_performance_tables",
]
