"""ScanNet++ fb05e13ad1 scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config(
    "scannetpp", "fb05e13ad1", seed=2, num_frames=250,
    # reference fb_config.py: bfe 50, hybrid odometer,
    # cam_trans lr 0.004, map 60
    baseframe_every=50, odometer_method="hybrid",
    tracking=dict(lrs=dict(cam_trans=0.004)),
    mapping=dict(num_iters=60))
