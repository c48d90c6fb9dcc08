from vmg_tpu.eval.metrics import (
    calculate_psnr,
    structural_similarity,
    rgb2ycbcr_matlab,
    psnr_float01,
    psnr_exceed_check,
)
from vmg_tpu.eval.inference import SlidingEvaluator
