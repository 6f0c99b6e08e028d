from nnal_tpu.ops.scoring_fused import pool_score_fused, make_pool_scorer
from nnal_tpu.ops.similarity_pallas import max_similarity, max_similarity_pallas
from nnal_tpu.ops.gather_pallas import gather_patches_pallas, gather_patches_auto
