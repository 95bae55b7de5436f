from diffuvolume_tpu.eval.metrics import epe_metric, d1_metric, thres_metric, metrics_batch
from diffuvolume_tpu.eval.pipeline import (
    acv_ddim_inference,
    pcw_ddim_inference,
    igev_ddim_inference,
)
