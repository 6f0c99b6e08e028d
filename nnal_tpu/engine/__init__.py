from nnal_tpu.engine.pw_experiment import PWExperiment
