from multivartv_tpu.solver.problem import Problem, Operators, build_problem, build_operators
from multivartv_tpu.solver.admm import ADMMState, admm_solve, initial_state
from multivartv_tpu.solver.path import lam_max, create_lambdas, solve_path
from multivartv_tpu.solver.cv import kfold_indices, cross_validate
