from diffuvolume_tpu.ops.cost_volume import (
    groupwise_correlation,
    groupwise_correlation_4d,
    build_gwc_volume,
    build_gwc_volume_norm,
    build_gwc_volume_unfold,
    build_gwc_volume_v1,
    build_concat_volume,
    build_correlation_volume_ones,
    build_signed_correlation_volume,
    patch_aggregation,
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
    spatial_transformer,
    spatial_transformer_grid,
    forward_interpolate,
)
