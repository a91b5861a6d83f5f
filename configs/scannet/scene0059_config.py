"""ScanNet scene0059_00 scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config(
    "scannet", "scene0059_00", seed=2,
    # reference scene59_config.py: tracking depth weight 0.9
    tracking=dict(loss_weights=dict(im=0.5, depth=0.9)))
