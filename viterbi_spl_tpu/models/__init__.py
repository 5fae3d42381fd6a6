from .targets import (
    dcnet_loss,
    gaussian_blur_targets,
    jdc_loss,
    softmax_smoothed_loss,
    tonet_labels,
    tonet_loss,
)
from .dcnet import DCNet
from .msnet import MSNet
from .ftanet import FTANet
from .jdc import JDC
from .tonet import TONet, cfp_to_tcfp
from .imm import IMM, IMMConfig

__all__ = [
    "DCNet",
    "MSNet",
    "FTANet",
    "JDC",
    "gaussian_blur_targets",
    "dcnet_loss",
    "softmax_smoothed_loss",
    "jdc_loss",
    "tonet_labels",
    "tonet_loss",
    "TONet",
    "cfp_to_tcfp",
    "IMM",
    "IMMConfig",
]
