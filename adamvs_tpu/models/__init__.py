from .adamvs import AdaMVS, correlation_volume, parse_depth_values
from .msrednet import MSREDNet
from .losses import cas_mvs_vis_loss, cas_rednet_loss, masked_mean, smooth_l1


def build_model(name: str, **kwargs):
    """Model factory by CLI name (reference train_whu.py:89-107)."""
    if name == "adamvs":
        return AdaMVS(**kwargs)
    if name == "msrednet":
        return MSREDNet(**kwargs)
    raise ValueError(f"unknown model {name!r} (choose adamvs | msrednet)")


def model_loss(name: str):
    if name == "adamvs":
        return cas_mvs_vis_loss
    if name == "msrednet":
        return cas_rednet_loss
    raise ValueError(f"unknown model {name!r}")
