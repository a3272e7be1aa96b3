from .lists import build_sample_list, build_predict_list, SampleSpec, PredictSpec
from .pipeline import (
    TrainSample,
    PredictSample,
    center_image,
    load_train_sample,
    load_predict_sample,
    color_augment,
    gaussian_augment,
)
