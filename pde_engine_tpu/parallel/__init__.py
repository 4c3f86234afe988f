from .mesh import CANDIDATE_AXIS, candidate_mesh, replicated, shard_batch  # noqa: F401
from .search import ScreenResult, make_search_kernel, register_residual  # noqa: F401
