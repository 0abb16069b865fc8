from .attack_eval import (  # noqa: F401
    AttackEvalConfig, build_attack, evaluate_attacks,
)
from .clean_eval import (  # noqa: F401
    CleanEvalConfig, batch_post_process_disparity, eigen_crop_mask,
    evaluate_clean,
)
from .pose_eval import (  # noqa: F401
    compute_ate, dump_xyz, trajectory_ates,
)
from .presets import EVAL_PRESETS  # noqa: F401
from .sweeps import (  # noqa: F401
    attack_steps_sweep, crosscheck_matrix, objects_sweep, physical_eval,
)
