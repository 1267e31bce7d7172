from mit_driverless_cv_traininginfra_tpu.infer.capacity import (  # noqa: F401
    AdaptiveCapacity,
)
from mit_driverless_cv_traininginfra_tpu.infer.pipeline import (  # noqa: F401
    PipelineOut,
    two_stage_pipeline,
    two_stage_pipeline_int8,
)
from mit_driverless_cv_traininginfra_tpu.infer.serving import (  # noqa: F401
    TwoStageServer,
)
from mit_driverless_cv_traininginfra_tpu.infer.microbatch import (  # noqa: F401
    MicroBatcher,
)
