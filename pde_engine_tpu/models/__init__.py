from .base import Problem, load_problem, register  # noqa: F401
from . import force_free, kerr  # noqa: F401  (registers built-ins)
from . import laplace_gs  # noqa: F401  (registers new problem families)
