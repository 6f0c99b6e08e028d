from nnal_tpu.ops.scoring_fused import pool_score_fused, make_pool_scorer
