from msml_tpu.heads.margin import (
    SoftmaxHead,
    MarginHead,
    cosine_logits,
    amcos_margin,
    amarc_margin,
    get_margin_fn,
)
from msml_tpu.heads.partial_fc import PartialFC, partial_fc_loss
