from .pfm import read_pfm, write_pfm
from .exr import read_exr_depth, write_exr_depth
from .cams_text import (
    PredictCamera,
    PredictPhoto,
    read_blendedmvs_cam,
    read_dtu_cam,
    read_obliquewhu_cam,
    read_predict_cameras,
    read_predict_image_paths,
    read_predict_images,
    read_view_pairs,
    read_whu_cam,
    write_red_cam,
)
from .images import read_image, read_gt_depth
