from .losses import (  # noqa: F401
    cross_entropy, kl_divergence, hidden_state_mse, get_layers_to_supervise,
    LABEL_PAD,
)
from .state import (TrainState, OptimizerConfig, make_optimizer,  # noqa: F401
                    place_state)
from .distill import DistillConfig, build_train_step, build_finetune_step  # noqa: F401
from .student import init_student_from_teacher, student_layer_map  # noqa: F401
from .data import (  # noqa: F401
    Collator, shift_and_mask, prepare_labels, prev_prompt_from_output,
    is_wer_in_range, in_length_range, pack_samples,
)
from .checkpoint import CheckpointManager  # noqa: F401
