"""Shared CLI flags + two-pass registry-driven parsing (capability of
/root/reference/options/base_options.py:9-164).

Flag surface mirrors the reference so scripts/configs carry over unchanged;
TPU deltas: ``--gpu_ids`` is accepted for compatibility but device selection
is JAX's (``-1`` forces CPU), and parsed options are dumped to
``{checkpoints_dir}/{name}/{phase}_opt.txt`` with non-default annotations.
"""

from __future__ import annotations

import argparse
import os

from dfmir_tpu.utils.util import mkdirs, str2bool


class BaseOptions:
    def __init__(self, cmd_line=None):
        self.initialized = False
        self.cmd_line = cmd_line.split() if cmd_line is not None else None

    def initialize(self, parser: argparse.ArgumentParser):
        # basic parameters
        parser.add_argument("--dataroot", default="placeholder",
                            help="path to images (should have subfolders "
                                 "trainA, trainB, valA, valB, etc)")
        parser.add_argument("--name", type=str, default="experiment_name",
                            help="name of the experiment")
        parser.add_argument("--easy_label", type=str,
                            default="experiment_name")
        parser.add_argument("--gpu_ids", type=str, default="0",
                            help="compat flag; use -1 to force CPU")
        parser.add_argument("--checkpoints_dir", type=str,
                            default="./checkpoints")
        parser.add_argument("--seed", type=int, default=0,
                            help="global RNG seed (data aug + init)")
        # model parameters
        parser.add_argument("--model", type=str, default="registration")
        parser.add_argument("--input_nc", type=int, default=1)
        parser.add_argument("--output_nc", type=int, default=1)
        parser.add_argument("--ngf", type=int, default=64)
        parser.add_argument("--ndf", type=int, default=64)
        parser.add_argument("--netD", type=str, default="basic",
                            choices=["basic", "n_layers", "pixel", "patch",
                                     "stylegan2", "tilestylegan2",
                                     "patchstylegan2"])
        parser.add_argument("--netG", type=str, default="resnet_9blocks",
                            choices=["resnet_9blocks", "resnet_6blocks",
                                     "resnet_4blocks", "unet_256",
                                     "unet_128", "stylegan2",
                                     "smallstylegan2", "resnet_cat"])
        parser.add_argument("--D_patch_size", type=int, default=64,
                            help="tile size for tilestylegan2 netD")
        parser.add_argument("--n_layers_D", type=int, default=3)
        parser.add_argument("--normG", type=str, default="instance",
                            choices=["instance", "batch", "none"])
        parser.add_argument("--normD", type=str, default="instance",
                            choices=["instance", "batch", "none"])
        parser.add_argument("--init_type", type=str, default="xavier",
                            choices=["normal", "xavier", "kaiming",
                                     "orthogonal"])
        parser.add_argument("--init_gain", type=float, default=0.02)
        parser.add_argument("--no_dropout", type=str2bool, nargs="?",
                            const=True, default=True)
        parser.add_argument("--no_antialias", action="store_true")
        parser.add_argument("--no_antialias_up", action="store_true")
        parser.add_argument("--compute_dtype", type=str, default="float32",
                            choices=["float32", "bfloat16"],
                            help="conv compute dtype (flow math stays f32)")
        # dataset parameters
        parser.add_argument("--dataset_mode", type=str, default="unaligned")
        parser.add_argument("--direction", type=str, default="AtoB")
        parser.add_argument("--serial_batches", action="store_true")
        parser.add_argument("--num_threads", default=0, type=int)
        parser.add_argument("--cache_images_mb", type=float, default=512,
                            help="cache decoded images in host RAM up to "
                                 "this many MB (0 disables); epochs re-read "
                                 "the same files and PIL decode dominates "
                                 "host data time on small datasets")
        parser.add_argument("--uint8_transfer", type=str2bool, nargs="?",
                            const=True, default=True,
                            help="ship image batches host->device as raw "
                                 "uint8 pixels and normalize on device "
                                 "(exact vs the float path, 4x less "
                                 "transfer)")
        parser.add_argument("--batch_size", type=int, default=1)
        parser.add_argument("--load_size", type=int, default=256)
        parser.add_argument("--crop_size", type=int, default=256)
        parser.add_argument("--max_dataset_size", type=int,
                            default=float("inf"))
        parser.add_argument("--preprocess", type=str,
                            default="resize_and_crop")
        parser.add_argument("--no_flip", action="store_true")
        parser.add_argument("--display_winsize", type=int, default=256)
        parser.add_argument("--random_scale_max", type=float, default=3.0)
        # additional parameters
        parser.add_argument("--stylegan2_G_num_downsampling", type=int,
                            default=1)
        parser.add_argument("--epoch", type=str, default="latest")
        parser.add_argument("--verbose", action="store_true")
        parser.add_argument("--suffix", default="", type=str)
        self.initialized = True
        return parser

    def gather_options(self):
        import sys

        from dfmir_tpu import data, models

        if not self.initialized:
            parser = argparse.ArgumentParser(
                formatter_class=argparse.ArgumentDefaultsHelpFormatter)
            parser = self.initialize(parser)
        opt, _ = parser.parse_known_args(self.cmd_line)

        # Option setters may re-parse to branch on flags (e.g. --CUT_mode);
        # make sure they see cmd_line when one was given.
        argv_saved = sys.argv
        if self.cmd_line is not None:
            sys.argv = [argv_saved[0]] + self.cmd_line
        try:
            model_option_setter = models.get_option_setter(opt.model)
            parser = model_option_setter(parser, self.isTrain)
            opt, _ = parser.parse_known_args(self.cmd_line)

            dataset_option_setter = data.get_option_setter(opt.dataset_mode)
            parser = dataset_option_setter(parser, self.isTrain)
        finally:
            sys.argv = argv_saved

        self.parser = parser
        return parser.parse_args(self.cmd_line)

    def print_options(self, opt) -> None:
        message = "----------------- Options ---------------\n"
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = f"\t[default: {default}]"
            message += f"{str(k):>25}: {str(v):<30}{comment}\n"
        message += "----------------- End -------------------"
        print(message)
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        mkdirs(expr_dir)
        file_name = os.path.join(expr_dir, f"{opt.phase}_opt.txt")
        try:
            with open(file_name, "w") as f:
                f.write(message + "\n")
        except PermissionError as err:
            print(f"permission error {err}")

    def parse(self):
        opt = self.gather_options()
        opt.isTrain = self.isTrain
        if opt.suffix:
            opt.name = opt.name + "_" + opt.suffix.format(**vars(opt))
        self.print_options(opt)
        # device selection: '-1' forces CPU (JAX otherwise picks TPU/GPU).
        # jax.config (not env) because a sitecustomize may pre-register an
        # accelerator plugin and force the platform list.
        str_ids = str(opt.gpu_ids).split(",")
        opt.gpu_ids = [int(i) for i in str_ids if int(i) >= 0]
        if not opt.gpu_ids:
            import jax

            jax.config.update("jax_platforms", "cpu")
        else:
            # Persistent compile cache for accelerator runs: over the axon
            # TPU tunnel a cold 256^2 train-step program costs minutes to
            # compile; cached executables load in seconds, so repeat
            # trainings (and the bench/soak harnesses, which share the
            # cache dir) skip the cold start.  CPU stays uncached — XLA:CPU
            # AOT loads burn mmaps (see tests/conftest.py).
            import jax

            try:
                forced = getattr(jax.config, "jax_platforms", None)
                if forced and "cpu" in str(forced):
                    raise RuntimeError("platform forced to cpu")
                cache = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))), ".jax_cache")
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 2.0)
                jax.config.update(
                    "jax_persistent_cache_min_entry_size_bytes", 0)
            except Exception:
                pass  # the cache is an optimization, never a failure
        self.opt = opt
        return opt
