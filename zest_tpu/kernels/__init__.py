from .plane_sweep import homo_warp_fast
