"""Trainer layer: loops, losses, metrics, checkpointing — equivalents of the
reference's ``nerf/utils.py`` (clean) and ``nerf/utils_wtmk_disen.py``
(watermark)."""

from .metrics import PSNRMeter, SSIMMeter, LPIPSMeter, BitAccMeter
from .trainer import Trainer
from .trainer_wtmk import WatermarkTrainer
from .checkpoint import save_checkpoint, load_checkpoint
