from transformer_explainability_tpu.data import imagenet_seg, expl_hdf5  # noqa: F401
