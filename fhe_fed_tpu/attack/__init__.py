from .dlg import dlg_attack, model_gradients, DLGResult
from .masking import gradient_sensitivity, top_k_mask, mask_gradients
from .similarity import mssim, uqi, vifp, msssim

__all__ = ["dlg_attack", "model_gradients", "DLGResult",
           "gradient_sensitivity", "top_k_mask", "mask_gradients",
           "mssim", "msssim", "uqi", "vifp"]
