"""CLI entry point: ``python -m egonerf_tpu --config configs/....txt``

Mirrors the reference's driver switch (reference: train.py:409-422):
``--evaluation 1`` runs test-set rendering from the newest checkpoint,
otherwise trains.
"""
import sys

from .train.config import parse_cli


def main(argv=None):
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    # import after config parsing so JAX platform env vars can be set first
    from .tools import enable_compilation_cache
    from .train.trainer import Trainer, render_test

    enable_compilation_cache()

    if cfg.evaluation:
        render_test(cfg)
    else:
        Trainer(cfg).train()


if __name__ == "__main__":
    main()
