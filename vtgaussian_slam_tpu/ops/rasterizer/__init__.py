from .projection import project_gaussians, ProjectedGaussians
from .dense import render_dense
from .tiled import render_tiled
from .api import render, RenderOutput
