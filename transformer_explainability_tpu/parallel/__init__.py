from transformer_explainability_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, vit_param_pspecs, shard_params, make_sharded_explain_fn,
)
from transformer_explainability_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_mesh, vit_pipeline_pspecs, shard_params_pipeline,
    make_pp_forward_fn, make_pp_train_step, init_pp_train_state,
    bert_pipeline_pspecs, shard_bert_params_pipeline,
    make_pp_bert_forward_fn, make_pp_bert_train_step,
)
