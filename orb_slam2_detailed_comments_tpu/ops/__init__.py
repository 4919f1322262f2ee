from .pattern import brief_pattern
from .pyramid import build_pyramid, gaussian_blur
from .fast import fast_score_map, nms_3x3
from .hamming import hamming_distance_matrix, popcount
