"""Dataset factory.

Parity: `get_dataset` dispatch (/root/reference/src/vtgaussian_slam.py:49-73).
"""
from .base import RGBDDataset
from .dataconfig import load_dataset_config
from .loaders import (
    Ai2thorDataset,
    AzureKinectDataset,
    ICLDataset,
    KittiDataset,
    NeRFCaptureDataset,
    Record3DDataset,
    RealsenseDataset,
    ReplicaDataset,
    ReplicaV2Dataset,
    ScannetDataset,
    ScannetPPDataset,
    TUMDataset,
)
from .synthetic import SyntheticRoomDataset

_FACTORY = {
    "icl": ICLDataset,
    "replica": ReplicaDataset,
    "replicav2": ReplicaV2Dataset,
    "azure": AzureKinectDataset,
    "azurekinect": AzureKinectDataset,
    "scannet": ScannetDataset,
    "ai2thor": Ai2thorDataset,
    "record3d": Record3DDataset,
    "realsense": RealsenseDataset,
    "tum": TUMDataset,
    "synthetic": SyntheticRoomDataset,
}


def get_dataset(config_dict, basedir, sequence, **kwargs):
    name = config_dict["dataset_name"].lower()
    if name == "scannetpp":
        return ScannetPPDataset(basedir, sequence, **kwargs)
    if name == "nerfcapture":
        return NeRFCaptureDataset(basedir, sequence, **kwargs)
    if name == "synthetic":
        return SyntheticRoomDataset(**{**config_dict.get("synthetic", {}), **kwargs})
    if name in _FACTORY:
        return _FACTORY[name](config_dict, basedir, sequence, **kwargs)
    raise ValueError(f"Unknown dataset name {config_dict['dataset_name']}")
