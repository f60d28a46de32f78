from cdae_tpu.solver.solver import Solver, SGDSolver
from cdae_tpu.solver import optimizer

__all__ = ["Solver", "SGDSolver", "optimizer"]
