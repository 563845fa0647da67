from chadavit_tpu.train.dino_step import DinoStepConfig, make_dino_train_step  # noqa: F401
from chadavit_tpu.train.optim import build_group_tx, grouped_optimizer, label_params  # noqa: F401
from chadavit_tpu.train.schedules import cosine_tau, multistep_lr, warmup_cosine_lr  # noqa: F401
from chadavit_tpu.train.state import DinoState, ProbeState  # noqa: F401
