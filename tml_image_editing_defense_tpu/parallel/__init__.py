from tml_image_editing_defense_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_along,
)
from tml_image_editing_defense_tpu.parallel.eot import make_sharded_eot_pgd_step  # noqa: F401
from tml_image_editing_defense_tpu.parallel.sweep import (  # noqa: F401
    batch_attack_data,
    make_batched_pgd_step,
    make_batched_pgd_loop,
)
