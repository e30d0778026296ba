from .grid_sample import grid_sample_2d, grid_sample_3d, resize_bilinear_align_corners
from .homography import homo_warp, homography_grid
