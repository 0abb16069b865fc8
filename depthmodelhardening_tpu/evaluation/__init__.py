from .attack_eval import (  # noqa: F401
    AttackEvalConfig, build_attack, evaluate_attacks,
)
from .clean_eval import (  # noqa: F401
    CleanEvalConfig, batch_post_process_disparity, eigen_crop_mask,
    evaluate_clean,
)
