"""Pipeline CLI: split -> preprocess -> train -> inference -> evaluate.

Flag-for-flag parity with the reference orchestrator (``main.py:50-67``):
``--mode {all,split,preprocess,train,inference,evaluate}`` plus the same
path flags and skip switches.  Architectural divergence (deliberate): the
reference shells out to five subprocesses (``main.py:80-136``); here every
stage is an in-process library call sharing one JAX runtime, one config
object and one volume cache — same on-disk artifact contract, no process
boundaries, no config write-back (``scripts/train.py:55`` defect).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from light_unet_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native Lightweight 3D U-Net pipeline",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  python main.py --mode all
  python main.py --mode split
  python main.py --mode train --config configs/unet_fl70.yaml
  python main.py --mode inference --model_path models/best_model.pth
""",
    )
    parser.add_argument(
        "--mode",
        type=str,
        required=True,
        choices=["all", "split", "preprocess", "train", "inference", "evaluate", "bench"],
        help="Execution mode",
    )
    # Aliases keep the reference stage scripts' exact argparse surfaces
    # working (scripts/train.py:26-35, scripts/inference.py:19-34,
    # scripts/evaluate.py:224-237, scripts/preprocess_data.py:362-374,
    # scripts/split_dataset.py:157-171 in the reference):
    #   --raw_dir == --data_root, --data_dir == --processed_dir,
    #   --model == --model_path, plus --prob_maps_dir / --output_dir /
    #   --train_ratio / --val_ratio / --test_ratio below.
    parser.add_argument("--config", type=str, default="configs/unet_fl70.yaml")
    parser.add_argument("--data_root", "--raw_dir", type=str, default="data/raw")
    parser.add_argument("--processed_dir", "--data_dir", type=str, default="data/processed")
    parser.add_argument("--splits_dir", type=str, default="data/splits")
    parser.add_argument("--model_path", "--model", type=str, default="models/best_model.pth")
    parser.add_argument("--split_file", type=str, default=None,
                        help="Split list for inference/evaluate (default: val)")
    parser.add_argument("--case_id", type=str, default=None, help="Single case for inference")
    parser.add_argument("--threshold", type=float, default=None, help="Probability threshold override")
    parser.add_argument("--split", type=str, default="all",
                        choices=["train", "val", "test", "all"], help="Preprocess split selection")
    parser.add_argument("--prob_maps_dir", type=str, default=None,
                        help="Probability-map dir for evaluate (default: <workdir>/inference/prob_maps)")
    parser.add_argument("--output_dir", type=str, default=None,
                        help="Split-lists dir (split stage) or metrics dir (evaluate stage)")
    parser.add_argument("--train_ratio", type=float, default=None)
    parser.add_argument("--val_ratio", type=float, default=None)
    parser.add_argument("--test_ratio", type=float, default=None)
    parser.add_argument("--no_prob_maps", action="store_true",
                        help="Skip saving probability maps (bboxes only; the "
                        "candidate table is extracted on device, so the prob "
                        "map never crosses device->host)")
    parser.add_argument("--allow_test", action="store_true",
                        help="Allow preprocessing the black-box test split")
    parser.add_argument("--skip_split", action="store_true")
    parser.add_argument("--skip_preprocess", action="store_true")
    parser.add_argument("--resume", action="store_true", help="Resume training from latest checkpoint")
    parser.add_argument("--workdir", type=str, default=".",
                        help="Root for relative output paths (never mutates the config file)")
    parser.add_argument("--seed", type=int, default=None, help="Seed override")
    return parser


def _load_config(args) -> Config:
    cfg_path = Path(args.config)
    config = Config.load(cfg_path) if cfg_path.exists() else Config()
    if not cfg_path.exists():
        print(f"Config {cfg_path} not found; using built-in defaults")
    config.data_dir = args.processed_dir
    config.splits_dir = args.splits_dir
    if args.seed is not None:
        config.experiment.seed = args.seed
    if args.threshold is not None:
        config.validation.default_threshold = args.threshold
    return config


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    config = _load_config(args)
    workdir = Path(args.workdir)

    # persistent XLA compilation cache: later processes skip the cold-start
    # compile entirely (BENCH_r02 measured 254.8 s of it over the tunnel)
    from light_unet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(config.tpu.compilation_cache_dir)

    # multi-host entry: must run before first device use so jax.devices()
    # (and every mesh built from it) spans all processes
    from light_unet_tpu.parallel.distributed import maybe_distributed_init

    maybe_distributed_init(config.tpu)

    # ensure the standard directory tree exists (main.py:71-77)
    for d in (
        args.data_root,
        args.processed_dir,
        args.splits_dir,
        workdir / "models/checkpoints",
        workdir / "logs",
        workdir / "inference/prob_maps",
        workdir / "inference/bboxes",
    ):
        Path(d).mkdir(parents=True, exist_ok=True)

    stages = ["split", "preprocess", "train", "inference", "evaluate"] if args.mode == "all" else [args.mode]
    default_split_file = args.split_file or str(Path(args.splits_dir) / "val_list.txt")

    print("=" * 80)
    print("TPU-NATIVE LIGHTWEIGHT 3D U-NET PIPELINE")
    print("=" * 80)
    print(f"Mode: {args.mode} | Config: {args.config}")
    print(f"Raw: {args.data_root} | Processed: {args.processed_dir} | Splits: {args.splits_dir}")

    for stage in stages:
        if stage == "split":
            if args.skip_split:
                print("\n⊗ Skipping data splitting")
                continue
            from light_unet_tpu.pipeline.split import split_dataset

            sr = config.data.split_ratio
            split_dataset(
                args.data_root,
                args.output_dir or args.splits_dir,
                train_ratio=args.train_ratio if args.train_ratio is not None else sr.train,
                val_ratio=args.val_ratio if args.val_ratio is not None else sr.val,
                test_ratio=args.test_ratio if args.test_ratio is not None else sr.test,
                seed=config.experiment.seed,
            )
        elif stage == "preprocess":
            if args.skip_preprocess:
                print("\n⊗ Skipping preprocessing")
                continue
            from light_unet_tpu.pipeline.preprocess import run_preprocess

            run_preprocess(
                config,
                args.data_root,
                args.processed_dir,
                args.splits_dir,
                split=args.split,
                allow_test=args.allow_test,
            )
        elif stage == "train":
            from light_unet_tpu.core.trainer import Trainer

            trainer = Trainer(config, workdir=args.workdir)
            if args.resume:
                trainer.resume()
            trainer.train()
        elif stage == "inference":
            from light_unet_tpu.core.inferencer import Inferencer

            model_path = workdir / args.model_path if not Path(args.model_path).is_absolute() else Path(args.model_path)
            inferencer = Inferencer(
                config, model_path, workdir=args.workdir,
                save_prob_maps=not args.no_prob_maps,
            )
            if args.case_id:
                inferencer.infer_case(
                    args.case_id, args.processed_dir, threshold=config.validation.default_threshold
                )
            else:
                inferencer.infer_split(default_split_file, args.processed_dir)
        elif stage == "evaluate":
            from light_unet_tpu.pipeline.evaluate import run_evaluate

            run_evaluate(
                config,
                default_split_file,
                args.prob_maps_dir or workdir / "inference/prob_maps",
                args.processed_dir,
                args.output_dir or workdir / "inference",
            )
        elif stage == "bench":
            from bench import main as bench_main  # repo-root bench harness

            bench_main()
    print("\n" + "=" * 80)
    print("PIPELINE COMPLETED SUCCESSFULLY")
    print("=" * 80)
    return 0


if __name__ == "__main__":
    sys.exit(run())
