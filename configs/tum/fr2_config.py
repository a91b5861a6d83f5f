"""TUM freiburg2_xyz scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config("tum", "freiburg2_xyz", seed=2, sequence="rgbd_dataset_freiburg2_xyz")
