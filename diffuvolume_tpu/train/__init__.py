from diffuvolume_tpu.train.loss import (
    smooth_l1,
    multi_scale_loss,
    SCENEFLOW_WEIGHTS,
    SCENEFLOW_WEIGHTS_FREEZE_ATTN,
    KITTI12_WEIGHTS,
)
from diffuvolume_tpu.train.lr import milestone_lr_schedule
