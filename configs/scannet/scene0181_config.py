"""ScanNet scene0181_00 scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config(
    "scannet", "scene0181_00", seed=2,
    # reference scene181_config.py: bfe 50, sil 0.99, map 80, depth 0.9
    baseframe_every=50,
    tracking=dict(sil_thres=0.99, loss_weights=dict(im=0.5, depth=0.9)),
    mapping=dict(num_iters=80))
