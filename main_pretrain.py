"""DINO self-supervised pretraining entry point (reference ``main_pretrain.py``).

Usage (reference CLI preserved):
    python main_pretrain.py --config-path scripts/pretrain --config-name dino.yaml \
        [dotted.key=value ...]
"""

from chadavit_tpu.cli import load_cfg
from chadavit_tpu.config import parse_pretrain_cfg
from chadavit_tpu.train.loop import run_dino_pretrain


def main(argv=None):
    cfg = parse_pretrain_cfg(load_cfg(argv, description=__doc__))
    metrics = run_dino_pretrain(cfg, max_steps=cfg.get("max_steps"))
    print({k: round(v, 5) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
