from gpt2_image_captioning_tpu.parallel.collectives import (  # noqa: F401
    all_gather_batch,
    pmean_scalar,
    psum_scalar,
)
from gpt2_image_captioning_tpu.parallel.pipeline import (  # noqa: F401
    PIPE_AXIS,
    create_pipeline_mesh,
    make_pipeline_loss_and_grad,
    make_pipeline_train_step,
    pipeline_param_specs,
)
from gpt2_image_captioning_tpu.parallel.sequence import (  # noqa: F401
    SEQ_AXIS,
    create_sp_mesh,
    make_sp_loss_and_grad,
    pad_batch_for_sp,
)
from gpt2_image_captioning_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
