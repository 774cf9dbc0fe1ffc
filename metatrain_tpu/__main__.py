"""The ``mtt-tpu`` command line interface.

Counterpart of reference ``src/metatrain/__main__.py``: three subcommands
(``train``, ``eval``, ``export``), timestamped output directories,
``error.log`` capture on failure.
"""

from __future__ import annotations

import argparse
import datetime
import logging
import sys
import traceback
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="mtt-tpu",
        description="TPU-native training and evaluation of atomistic ML models",
    )
    from . import __version__

    parser.add_argument(
        "--version", action="version", version=f"mtt-tpu {__version__}"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    train = sub.add_parser("train", help="train a model from an options file")
    train.add_argument("options", help="YAML options file")
    train.add_argument("-o", "--output", default="model.mtt")
    train.add_argument(
        "--restart",
        default=None,
        help="checkpoint to restart from, or 'auto' for the most recent",
    )
    train.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the training run into DIR",
    )
    train.add_argument(
        "-r",
        "--override",
        action="append",
        default=[],
        help="dotlist override, e.g. -r architecture.training.num_epochs=10",
    )

    evaluate = sub.add_parser("eval", help="evaluate an exported model")
    evaluate.add_argument("model", help="exported .mtt file or checkpoint")
    evaluate.add_argument("options", help="YAML eval dataset options")
    evaluate.add_argument("-o", "--output", default=None)
    evaluate.add_argument("-b", "--batch-size", type=int, default=16)
    evaluate.add_argument("--check-consistency", action="store_true")
    evaluate.add_argument(
        "--warm-up",
        type=int,
        default=1,
        metavar="N",
        help="number of untimed warm-up batches before the timed pass",
    )
    evaluate.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the evaluation into DIR",
    )

    drive = sub.add_parser(
        "drive", help="serve force calls to an i-PI server"
    )
    drive.add_argument("model", help="exported .mtt file or checkpoint")
    drive.add_argument(
        "template",
        help="structure file giving the atom types in server order",
    )
    drive.add_argument("--address", default="localhost")
    drive.add_argument("--port", type=int, default=31415)
    drive.add_argument(
        "--unix",
        default=None,
        metavar="NAME",
        help="unix socket: a path, or a bare name for /tmp/ipi_<NAME>",
    )

    serve = sub.add_parser(
        "serve",
        help="socket force server for MD-engine coupling (LAMMPS fix "
        "external adapter in examples/lammps/)",
    )
    serve.add_argument("model", help="exported .mtt file or checkpoint")
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=31415)
    serve.add_argument(
        "--unix", default=None, metavar="PATH", help="unix socket path"
    )
    serve.add_argument(
        "--persist",
        action="store_true",
        help="keep listening after a client disconnects",
    )

    defaults = sub.add_parser(
        "defaults",
        help="print an architecture's default hypers as an options-file "
        "skeleton (reference utils/architectures.py YAML default writer)",
    )
    defaults.add_argument("architecture", nargs="?", default=None,
                          help="architecture name; omit to list all")
    defaults.add_argument(
        "-o", "--output", default=None,
        help="write the YAML skeleton to a file instead of stdout",
    )

    import_torch = sub.add_parser(
        "import-torch",
        help="convert a torch metatrain checkpoint (.ckpt/.ckpt.gz) or a "
        "mace-torch foundation model (.pt/.model) into a native checkpoint",
    )
    import_torch.add_argument("checkpoint", help="torch checkpoint path")
    import_torch.add_argument("-o", "--output", default="model_converted.ckpt")
    import_torch.add_argument(
        "--last",
        action="store_true",
        help="convert the last (not best) model weights",
    )
    import_torch.add_argument(
        "--mace-head-target",
        default="energy",
        help="target name for a mace foundation model's head "
        "(foundation imports only)",
    )
    import_torch.add_argument(
        "--mace-head-name",
        default="default",
        help="internal head of a multi-head mace foundation model",
    )

    export = sub.add_parser("export", help="export a checkpoint")
    export.add_argument(
        "checkpoint",
        help="checkpoint path, URL, or hf://<org>/<repo>/<file> reference",
    )
    export.add_argument("-o", "--output", default="model.mtt")
    export.add_argument(
        "-m",
        "--metadata",
        default=None,
        help="YAML file with metadata to merge into the exported model",
    )
    export.add_argument(
        "-r",
        "--revision",
        "-b",
        "--branch",
        dest="revision",
        default=None,
        help="HF-Hub revision/branch for hf:// checkpoint references",
    )
    export.add_argument(
        "--token",
        default=None,
        help="HF-Hub access token (defaults to $HF_TOKEN)",
    )
    return parser


def _apply_overrides(options: dict, overrides: list) -> dict:
    """OmegaConf-style dotlist overrides (reference ``cli/train.py:151-161``)."""
    import yaml

    for override in overrides:
        if "=" not in override:
            raise ValueError(f"override {override!r} must be key=value")
        key, value = override.split("=", 1)
        target = options
        parts = key.split(".")
        for part in parts[:-1]:
            target = target.setdefault(part, {})
        target[parts[-1]] = yaml.safe_load(value)
    return options


def main(argv=None) -> int:
    from .utils.config import load_options
    from .utils.logging import setup_logging

    args = build_parser().parse_args(argv)

    if args.command == "train":
        now = datetime.datetime.now()
        output_dir = Path("outputs") / now.strftime("%Y-%m-%d") / now.strftime(
            "%H-%M-%S"
        )
        output_dir.mkdir(parents=True, exist_ok=True)
    else:
        output_dir = Path(".")

    with setup_logging(str(output_dir / "train.log") if args.command == "train" else None):
        try:
            if args.command == "train":
                from .cli.train import find_latest_checkpoint, train_model

                options = load_options(args.options)
                options = _apply_overrides(options, args.override)
                restart = args.restart
                if restart == "auto":
                    restart = find_latest_checkpoint()
                from .utils.profiling import profile_trace

                with profile_trace(args.profile):
                    train_model(
                        options,
                        output_dir=".",
                        checkpoint_dir=str(output_dir),
                        restart_from=restart,
                        output_name=args.output,
                    )
            elif args.command == "eval":
                from .cli.eval import eval_model

                from .utils.profiling import profile_trace

                options = load_options(args.options)
                with profile_trace(args.profile):
                    eval_model(
                        args.model,
                        options,
                        output_path=args.output,
                        batch_size=args.batch_size,
                        check_consistency=args.check_consistency,
                        warm_up=args.warm_up,
                    )
            elif args.command == "drive":
                from .calculator import Calculator
                from .data.readers import read_systems
                from .ipi import run_driver

                template = read_systems(args.template)[0]
                run_driver(
                    Calculator(args.model),
                    template.types,
                    address=args.address,
                    port=args.port,
                    unixsocket=args.unix,
                    pbc=template.pbc,
                )
            elif args.command == "serve":
                from .serve import run_server

                run_server(
                    args.model,
                    unix=args.unix,
                    host=args.host,
                    port=args.port,
                    persist=args.persist,
                )
            elif args.command == "defaults":
                import yaml

                from .utils.architectures import (
                    available_architectures,
                    get_default_hypers,
                )

                if args.architecture is None:
                    print("\n".join(available_architectures()))
                else:
                    skeleton = {
                        "architecture": {
                            "name": args.architecture,
                            **get_default_hypers(args.architecture),
                        },
                        "training_set": {
                            "systems": {"read_from": "dataset.xyz"},
                            "targets": {"energy": {"key": "energy"}},
                        },
                        "validation_set": 0.1,
                        "test_set": 0.0,
                    }
                    text = yaml.safe_dump(skeleton, sort_keys=False)
                    if args.output:
                        with open(args.output, "w") as f:
                            f.write(text)
                    else:
                        print(text, end="")
            elif args.command == "import-torch":
                from .interop import convert_torch_checkpoint
                from .utils.io import save_checkpoint_file

                if args.checkpoint.endswith((".pt", ".model")):
                    # mace-torch foundation model files are pickled whole
                    # modules, not metatrain checkpoints
                    from .interop.mace_foundation import (
                        convert_mace_foundation,
                    )

                    converted = convert_mace_foundation(
                        args.checkpoint,
                        target_name=args.mace_head_target,
                        head_name=args.mace_head_name,
                    )
                else:
                    converted = convert_torch_checkpoint(
                        args.checkpoint, use_best=not args.last
                    )
                save_checkpoint_file(converted, args.output)
                logging.getLogger("metatrain_tpu").info(
                    "wrote converted checkpoint to %s", args.output
                )
            elif args.command == "export":
                from .cli.export import export_model

                metadata = None
                if args.metadata:
                    import yaml

                    with open(args.metadata) as f:
                        metadata = yaml.safe_load(f)
                export_model(
                    args.checkpoint,
                    args.output,
                    metadata=metadata,
                    revision=args.revision,
                    hf_token=args.token,
                )
        except Exception:
            error_log = output_dir / "error.log"
            with open(error_log, "w") as f:
                f.write(traceback.format_exc())
            logging.getLogger("metatrain_tpu").error(
                "command failed; full traceback in %s", error_log
            )
            raise
    return 0


if __name__ == "__main__":
    sys.exit(main())
