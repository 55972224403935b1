from .fad import frechet_distance
from .kd import kernel_distance, kid_features_to_metric
from .prdc import prdc, nearest_neighbour_distances
from .apa import apa, apa_compute_d_x_xp

__all__ = [
    "frechet_distance",
    "kernel_distance",
    "kid_features_to_metric",
    "prdc",
    "nearest_neighbour_distances",
    "apa",
    "apa_compute_d_x_xp",
]
