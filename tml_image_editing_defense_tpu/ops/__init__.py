from tml_image_editing_defense_tpu.ops.pgd_kernels import (  # noqa: F401
    fused_perturbation_step,
    pgd_l2_update,
    pgd_linf_update,
)
