from .ball_query import ball_query  # noqa: F401
from .knn import knn_points  # noqa: F401
