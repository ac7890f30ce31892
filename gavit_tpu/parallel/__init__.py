from gavit_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    data_feed_spec,
    replicated_sharding,
    shard_batch,
)
from gavit_tpu.parallel.op_sharding import (  # noqa: F401
    batch_partitioned,
    elementwise_partitioned,
    head_shard_constraint,
    seq_shard_constraint,
    tp_axis_in_context,
)
from gavit_tpu.parallel.pp import (  # noqa: F401
    make_pipe_mesh,
    merge_params,
    pipeline_apply,
    pipeline_forward_fn,
    split_params,
)
from gavit_tpu.parallel.cp import (  # noqa: F401
    ctx_forward,
    ctx_forward_fn,
    make_cp_mesh,
)
from gavit_tpu.parallel.ring import (  # noqa: F401
    make_ctx_mesh,
    ring_attention,
    ring_attention_local,
)
from gavit_tpu.parallel.tp import (  # noqa: F401
    model_param_specs,
    shard_model_params,
    train_state_shardings,
)
