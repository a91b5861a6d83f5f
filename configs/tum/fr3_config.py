"""TUM freiburg3_long_office_household scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config("tum", "freiburg3_long_office_household", seed=2, sequence="rgbd_dataset_freiburg3_long_office_household")
