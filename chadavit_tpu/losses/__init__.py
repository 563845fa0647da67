from chadavit_tpu.losses.dino import dino_loss_and_center, teacher_temp_schedule  # noqa: F401
