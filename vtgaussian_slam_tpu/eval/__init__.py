from .metrics import calc_psnr, evaluate_ate, align_horn
from .evaluate import eval_sequence, eval_recon
from .mesh import accuracy_completion, calc_2d_metric, render_mesh_depth
from .plyio import read_ply, write_ply
