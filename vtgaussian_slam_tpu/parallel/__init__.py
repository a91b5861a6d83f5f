from .sharded import (make_mesh, sharded_render, sharded_tracking_step,
                      sharded_mapping_step)
