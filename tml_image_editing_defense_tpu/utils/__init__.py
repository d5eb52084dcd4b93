from tml_image_editing_defense_tpu.utils.vis import (  # noqa: F401
    add_text_to_image,
    create_table_plot,
)
from tml_image_editing_defense_tpu.utils.logging import MetricsLogger  # noqa: F401
