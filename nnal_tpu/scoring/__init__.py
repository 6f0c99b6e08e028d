from nnal_tpu.scoring.uncertainty import (
    shannon_entropy,
    binary_uncertainty_scores,
    uncertainty_filter,
    binary_uncertainty_filter,
    bald_from_mc,
    qbc_js_scores,
)
from nnal_tpu.scoring.pmf import sample_query_pmf
from nnal_tpu.scoring.sdp import solve_a_optimal, fi_query_distribution
