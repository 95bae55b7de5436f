from diffuvolume_tpu.ops.cost_volume import (
    groupwise_correlation,
    build_gwc_volume,
    build_concat_volume,
    build_signed_correlation_volume,
)
from diffuvolume_tpu.ops.regression import (
    disparity_regression,
    disparity_uncertainty,
    disparity_variance,
    resize_linear,
    resize_volume_trilinear,
    upsample_cost_and_regress,
)
from diffuvolume_tpu.ops.sampling import (
    stereo_bilinear_sample,
    warp_right_to_left,
    context_upsample,
)
