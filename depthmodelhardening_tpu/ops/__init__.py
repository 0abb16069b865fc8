from .geometry import (
    disp_to_depth,
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
    pixel_grid,
    backproject_depth,
    project_3d,
    reproject_coords,
)
from .sampling import grid_sample, bilinear_sample_pixels
from .resize import bilinear_resize, nearest_upsample2
from .ssim import ssim
from .metrics import (
    compute_depth_errors,
    compute_errors_masked,
    get_mean_depth_diff,
)
from .losses import reprojection_loss, smooth_loss
