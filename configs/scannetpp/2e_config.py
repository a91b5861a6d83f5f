"""ScanNet++ 2e74812d00 scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config("scannetpp", "2e74812d00", seed=2, num_frames=250)
