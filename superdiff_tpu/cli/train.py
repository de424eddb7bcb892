"""Training CLI.

Capability of ``src/train.py``: YAML config + CLI overrides, experiment/run
ids, dataset/task selection, logging toggles — with dotted-path overrides
replacing the reference's ad-hoc string mutation, plus ``--resume`` (absent
there: its checkpoints could never be loaded, SURVEY.md §5.3) and
``--synthetic`` for datasetless smoke runs.

Usage:
    python -m superdiff_tpu.cli.train --config cfg.yaml \
        --dataset PNEUMONIA --experiment-id e1 --run-id r1 \
        --set training.batch_size=16 --set model.preset=small64
"""

from __future__ import annotations

import argparse
import sys

from superdiff_tpu.config import load_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a diffusion model")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--experiment-id", "--experiment_id", dest="experiment_id")
    p.add_argument("--run-id", "--run_id", dest="run_id")
    # TB|PNEUMONIA is the reference surface (src/train.py:20); any other
    # value selects a same-layout task tree under the dataset root (e.g.
    # a generated SUPERPOSED tree for superposition distillation) — the
    # dataset index errors out at startup when the tree doesn't exist.
    p.add_argument("--dataset")
    p.add_argument("--task")
    p.add_argument("--use-wandb", "--use_wandb", dest="use_wandb",
                   default=None)
    p.add_argument("--use-tensorboard", "--use_tensorboard",
                   dest="use_tensorboard", default=None)
    p.add_argument("--dataset-root", default=None,
                   help="explicit dataset directory (overrides paths)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (no dataset needed)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY.PATH=VALUE")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    if args.experiment_id:
        cfg.experiment_id = args.experiment_id
    if args.run_id:
        cfg.run_id = args.run_id
    if args.dataset:
        cfg.dataset = args.dataset
        cfg.task = args.dataset
    if args.task:
        cfg.task = args.task
    for flag in ("use_wandb", "use_tensorboard"):
        v = getattr(args, flag)
        if v is not None:
            setattr(cfg.logging, flag,
                    str(v).strip().lower() not in ("false", "0", "no"))

    from superdiff_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()

    from superdiff_tpu.training.loop import train
    summary = train(cfg, dataset_root=args.dataset_root,
                    resume=not args.no_resume,
                    use_synthetic=args.synthetic)
    print(summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
