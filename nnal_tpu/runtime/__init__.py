from nnal_tpu.runtime.native import (
    native_available,
    gather_patches_native,
    gather_labels_native,
)
