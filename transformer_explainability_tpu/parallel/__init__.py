from transformer_explainability_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, vit_param_pspecs, shard_params, make_sharded_explain_fn,
)
