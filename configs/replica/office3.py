"""Replica office3 scene config (reference schema; see configs/common.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from configs.common import make_config

config = make_config("replica", "office3", seed=2)
