from tml_image_editing_defense_tpu.attack.forward import (  # noqa: F401
    CondInputs,
    attack_forward,
    denoise_chain,
    make_time_ids,
    select_cond,
)
from tml_image_editing_defense_tpu.attack.pgd import (  # noqa: F401
    AttackData,
    l2_perturbation_step,
    linf_perturbation_step,
    make_attack_data,
    make_eot_grad,
    make_pgd_loop,
    make_pgd_step,
    perturbation_step,
    renorm_l2,
    run_pgd,
)
