#!/usr/bin/env python
"""Training entry point.

Same CLI surface as the reference (`train.py`):

    python train.py --cfg configs/occnerf/zju_mocap/387/occnerf.yaml \
        [key value ...]
"""

from __future__ import annotations

from occnerf_tpu.config import make_cfg, parse_args
from occnerf_tpu.utils.platform import ensure_platform


def main() -> None:
    ensure_platform()
    parse_args()
    make_cfg()

    from occnerf_tpu.app import build_model
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer
    from occnerf_tpu.utils.log import Logger

    log = Logger()
    log.print_config()

    train_loader = create_dataloader("train")
    subject = train_loader.dataset.subject
    network, statics, params, state = build_model(subject)
    trainer = create_trainer(network, statics, params, state)

    epoch = 0
    while True:
        epoch += 1
        done = trainer.train(epoch=epoch, dataloader=train_loader)
        if done:
            break
    trainer.save_ckpt("latest")


if __name__ == "__main__":
    main()
