from chadavit_tpu.utils.checkpoint import (  # noqa: F401
    AutoResumer,
    Checkpointer,
    restore_pytree,
    save_pytree,
)
from chadavit_tpu.utils.logging import MetricLogger, replay_to_wandb  # noqa: F401
from chadavit_tpu.utils.profiling import StepTimer, trace  # noqa: F401
