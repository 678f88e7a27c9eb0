from multimodalbrainsurvival_tpu.ops.cox import (
    cox_partial_likelihood_loss,
    logcumsumexp,
)
from multimodalbrainsurvival_tpu.ops.nll_surv import nll_surv_loss

__all__ = [
    "cox_partial_likelihood_loss",
    "logcumsumexp",
    "nll_surv_loss",
]
