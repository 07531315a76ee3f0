from hybrid_ode_tpu.solvers.api import odeint, SOLVERS
from hybrid_ode_tpu.solvers.sync import odeint_erk_sync
from hybrid_ode_tpu.solvers.tableaus import TABLEAUS, ERKTableau

__all__ = ["odeint", "odeint_erk_sync", "SOLVERS", "TABLEAUS", "ERKTableau"]
