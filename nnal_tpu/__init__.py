"""nnal_tpu — TPU-native active-learning framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
jsourati/nn-active-learning (pool-based active learning for CNN image
classification and patch-wise 3D brain-MRI segmentation).

Layering (strict DAG, bottom -> top):

    core       config tree, RNG plumbing, experiment-state journal
    data       volume IO, patch gather (vectorized XLA), samplers, index algebra
    models     spec-driven CNN (2D/3D), losses, optimizers, checkpointing
    ops        Pallas kernels + fused XLA ops for the hot paths
    scoring    query strategies: uncertainty, Fisher/SDP, influence, core-set...
    engine     AL experiment orchestration (single/multi-subject, sequential)
    evaluation metrics, full-volume inference, post-processing
    parallel   device mesh, sharded pool scoring, DP/TP train steps
    cli        experiment drivers
"""

__version__ = "0.1.0"
