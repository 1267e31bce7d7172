from mit_driverless_cv_traininginfra_tpu.data.device_pool import (  # noqa: F401
    DevicePool,
)
