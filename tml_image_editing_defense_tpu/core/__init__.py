from tml_image_editing_defense_tpu.core.schedule import (  # noqa: F401
    NoiseSchedule,
    make_noise_schedule,
)
from tml_image_editing_defense_tpu.core.samplers import (  # noqa: F401
    DDIMSampler,
    LCMSampler,
    PLMSSampler,
    EulerSampler,
    DenoisePlan,
    make_sampler,
)
