from nnal_tpu.data.indexing import (
    global2local_inds,
    local2global_inds,
    expand_raveled_inds,
    ravel_binary_mask,
)
from nnal_tpu.data.patches import (
    gather_patches,
    gather_patches_normalized,
    gather_patches_multimg,
    pad_volumes,
    patch_radii,
)
from nnal_tpu.data.samplers import (
    generate_grid_samples,
    local_variance_map,
    high_variance_filter,
    sample_masked_volume,
)
from nnal_tpu.data.stats import volume_stats, multimg_stats
from nnal_tpu.data.batching import (
    gen_batch_inds,
    gen_minibatch_labeled_unlabeled_inds,
    generator_complete_data,
)
