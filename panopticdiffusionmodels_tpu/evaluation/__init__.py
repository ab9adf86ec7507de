from .mask_metrics import eval_mask_cnt, color_map, get_colormap
from .fid import frechet_distance, compute_statistics, fid_from_stats
from .kid import kid, mmd2_unbiased, polynomial_kernel
