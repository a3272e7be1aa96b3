from .camera import (
    Camera,
    ceil_to_multiple,
    convert_photogrammetric_extrinsic,
    crop_camera,
    crop_to_multiple,
    depth_sample_count,
    legacy_cam_array,
    camera_from_legacy,
    proj_matrix,
    scale_camera,
    stage_proj_matrices,
)
