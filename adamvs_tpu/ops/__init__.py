from .warp import bilinear_sample, plane_sweep_warp, warp_transform
from .sampling import uniform_depth_samples, windowed_depth_samples, window_min_and_interval
from .regression import (
    depth_regression,
    online_softmax_init,
    online_softmax_update,
    online_softmax_finalize,
)
