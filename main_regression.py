"""Regression probe evaluation (reference ``main_regression.py``): identical
skeleton to the linear probe with a 1-output regressor, MSE loss, and
R2/MSE/MAE/Pearson metrics (reference ``src/methods/regression.py``)."""

from chadavit_tpu.cli import load_cfg
from chadavit_tpu.config import parse_regression_cfg
from main_linear import run_probe


def main(argv=None):
    cfg = parse_regression_cfg(load_cfg(argv, description=__doc__))
    run_probe(cfg, task="regression")


if __name__ == "__main__":
    main()
