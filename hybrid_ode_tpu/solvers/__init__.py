from hybrid_ode_tpu.solvers.api import odeint, SOLVERS
from hybrid_ode_tpu.solvers.tableaus import TABLEAUS, ERKTableau

__all__ = ["odeint", "SOLVERS", "TABLEAUS", "ERKTableau"]
