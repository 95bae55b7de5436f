from diffuvolume_tpu.diffusion.schedule import (
    cosine_beta_schedule,
    DiffusionSchedule,
    make_schedule,
    extract,
    q_sample,
    predict_noise_from_start,
    ddim_time_pairs,
)
from diffuvolume_tpu.diffusion.schedule import ddim_step_coefficients
from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
from diffuvolume_tpu.diffusion.ddim import (
    DDIMConfig,
    ddim_sample,
    SCENEFLOW_DDIM,
    KITTI12_DDIM,
    KITTI15_DDIM,
)
