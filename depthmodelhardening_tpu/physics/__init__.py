from .calibration import Calibration, read_calib_file
from .light import (
    area_light, simple_add, tube_light_by_func, wavelength_to_rgb,
)
from .eot import (
    EoTCompositor,
    EoTConfig,
    monodepth2_K,
    quad_corners_world,
    project_corners,
    solve_homography,
    perspective_warp,
    sample_za,
    stereo_T,
    TRAIN_DIST_RANGE,
    EVAL_DIST_RANGE,
    ANGLE_RANGE,
    VEHICLE_SIZES,
    ORI_H,
    ORI_W,
)
