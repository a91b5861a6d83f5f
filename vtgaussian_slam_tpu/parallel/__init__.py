from .engine import (make_map_frame_binned_sharded,
                     make_track_frame_cached_sharded, make_mesh,
                     tile_pad_for)
from .sharded import (sharded_render, sharded_tracking_step,
                      sharded_mapping_step)
