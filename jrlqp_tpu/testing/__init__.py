"""Test-support library (shipped, like the reference L5 layer)."""
from .kkt import check_kkt, check_kkt_stationarity, check_kkt_feasibility, kkt_residual
from .random_matrices import rand_ortho, randn_rank, rand_dependent
from .random_problems import ProblemCharacteristics, RandomLeastSquare, random_problem

