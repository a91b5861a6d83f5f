from .metrics import calc_psnr, evaluate_ate, align_horn
from .evaluate import eval_sequence
