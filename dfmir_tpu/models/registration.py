"""Host-side orchestration of the paper model (capability of
/root/reference/models/registration_model.py:34-263 +
models/base_model.py:8-258 lifecycle).

The compute lives in the jitted ``dfmir_tpu.engine.RegistrationModel``; this
class owns everything around it: CLI flags, option-driven construction,
device placement / mesh sharding (the TPU replacement of DataParallel),
LR schedules, checkpoint save/load with the reference's filenames and
resume flags, and the visuals/losses surface the Visualizer consumes.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import (
    LRSchedule, RegistrationConfig, RegistrationModel, TrainState,
)
from dfmir_tpu.engine import checkpoints as ckpt
from dfmir_tpu.nets import resnet_generator_specs
from dfmir_tpu.parallel import make_mesh, replicate, shard_batch
from dfmir_tpu.utils.util import str2bool


@jax.jit
def _dequant_u8(x):
    """Device-side ToTensor+Normalize(0.5,0.5): uint8 -> f32 in [-1,1].
    Within 1 ulp of the host float path (XLA may fuse /255*2 into one
    multiply); pinned by tests/test_pipeline.py."""
    return x.astype(jnp.float32) / 255.0 * 2.0 - 1.0


class RegistrationTask:
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        """CUT flag block (reference registration_model.py:35-71)."""
        parser.add_argument("--CUT_mode", type=str, default="CUT",
                            choices=["CUT", "cut", "FastCUT", "fastcut"])
        parser.add_argument("--lambda_GAN", type=float, default=0.0)
        parser.add_argument("--lambda_NCE", type=float, default=0.25)
        parser.add_argument("--nce_idt", type=str2bool, nargs="?",
                            const=True, default=False)
        parser.add_argument("--nce_layers", type=str, default="0,4,8,12,16")
        parser.add_argument("--nce_includes_all_negatives_from_minibatch",
                            type=str2bool, nargs="?", const=True,
                            default=False)
        parser.add_argument("--netF", type=str, default="mlp_sample",
                            choices=["sample", "reshape", "mlp_sample"])
        parser.add_argument("--netF_nc", type=int, default=256)
        parser.add_argument("--nce_T", type=float, default=0.07)
        parser.add_argument("--num_patches", type=int, default=256)
        parser.add_argument("--flip_equivariance", type=str2bool, nargs="?",
                            const=True, default=False)
        parser.add_argument("--netR", type=str, default="vxm",
                            choices=["vxm", "vxm_transformer", "vxm_dual"],
                            help="registration net variant")
        parser.set_defaults(pool_size=0)
        opt, _ = parser.parse_known_args()
        if opt.CUT_mode.lower() == "cut":
            parser.set_defaults(nce_idt=True, lambda_NCE=0.25)
        elif opt.CUT_mode.lower() == "fastcut":
            parser.set_defaults(nce_idt=False, lambda_NCE=10.0,
                                flip_equivariance=True,
                                n_epochs=150, n_epochs_decay=50)
        else:
            raise ValueError(opt.CUT_mode)
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.isTrain = getattr(opt, "isTrain", False)
        self.cfg = RegistrationConfig.from_opt(opt)
        self.engine = RegistrationModel(self.cfg)
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.save_dir, exist_ok=True)

        self.loss_names = ["G", "NCE", "R", "smooth", "local"]
        self.visual_names = ["real_A", "fake_B", "real_B", "dvf",
                             "registered", "regA"]
        if opt.nce_idt and self.isTrain:
            self.loss_names += ["NCE_Y"]
            self.visual_names += ["idt_B"]
        self.model_names = ["G", "F", "R"] if self.isTrain else ["G", "R"]
        if self.cfg.lambda_GAN > 0 and self.isTrain:
            self.loss_names += ["G_GAN", "D"]
            self.model_names += ["D"]

        self.rng = jax.random.PRNGKey(int(getattr(opt, "seed", 0) or 0))
        self.state: TrainState = None
        self.mesh = None
        self.schedule = LRSchedule(opt) if self.isTrain else None
        self.metric = 0.0  # plateau-policy input
        self._losses = {}
        self._batch = None
        self._visuals_cache = None

    # ---------------------------------------------------------- lifecycle

    def data_dependent_initialize(self, data=None):
        """Static shapes make one-shot init possible; kept for CLI parity
        with the reference's two-phase setup
        (registration_model.py:119-136)."""
        if self.state is not None:
            return
        self.rng, key = jax.random.split(self.rng)
        self.state = self.engine.init_state(key)

    def setup(self, opt):
        """Schedulers + optional checkpoint load
        (reference base_model.py:89-101)."""
        self.data_dependent_initialize()
        if (self.isTrain and getattr(opt, "continue_train", False)) \
                or not self.isTrain:
            self.load_networks(opt.epoch)

    def parallelize(self):
        """SPMD replacement of DataParallel: batch sharded over a ``data``
        mesh axis when multiple devices are visible and the batch divides."""
        n = len(jax.devices())
        if n > 1 and self.cfg.batch_size % n == 0:
            self.mesh = make_mesh(n_data=n)
            self.state = replicate(self.mesh, self.state)

    def eval(self):
        pass  # instance norm + dropout-off: train/eval forward identical

    # -------------------------------------------------------------- steps

    def set_input(self, batch):
        AtoB = self.opt.direction == "AtoB"
        A = np.asarray(batch["A" if AtoB else "B"])
        B = np.asarray(batch["B" if AtoB else "A"])
        # uint8 batches ship raw pixels (4x less H2D) and dequantize on
        # device; float batches are already normalized on the host.
        dequant = A.dtype == np.uint8
        if not dequant:
            A, B = A.astype(np.float32, copy=False), \
                B.astype(np.float32, copy=False)
        if self.mesh is not None:
            A, B = shard_batch(self.mesh, (A, B))
        else:
            A, B = jnp.asarray(A), jnp.asarray(B)
        if dequant:
            A, B = _dequant_u8(A), _dequant_u8(B)
        self._batch = (A, B)
        self.image_paths = batch.get("A_paths")

    def optimize_parameters(self):
        A, B = self._batch
        self.rng, key = jax.random.split(self.rng)
        lr = jnp.float32(self.schedule.current_lr())
        self.state, metrics = self.engine.train_step(
            self.state, A, B, key, lr)
        self._losses = metrics
        self._visuals_cache = None

    def test(self):
        A, B = self._batch
        self.rng, key = jax.random.split(self.rng)
        _, aux = self.engine.eval_step(self.state.params, A, B, key)
        self._aux = aux
        self._visuals_cache = None

    def register_pair(self, A=None, B=None):
        """Inference path (reference test.py:77-78): returns
        (fake_B, idt_B, y_source, pos_flow) as device arrays."""
        if A is None:
            A, B = self._batch
        return self.engine.register(self.state.params, A, B)

    def registration_stats(self):
        """Scalar deformation-health stats on the current batch (folding
        fraction, |J| range, max displacement) — logged on --jac_freq."""
        A, B = self._batch
        stats = self.engine.flow_stats(self.state.params, A, B)
        return OrderedDict((k, float(v)) for k, v in stats.items())

    # ---------------------------------------------------------- accessors

    def get_current_losses(self) -> OrderedDict:
        out = OrderedDict()
        for name in self.loss_names:
            if name in self._losses:
                out[name] = float(self._losses[name])
        return out

    def compute_visuals(self):
        if self._visuals_cache is None and self._batch is not None:
            A, B = self._batch
            self.rng, key = jax.random.split(self.rng)
            visuals, _ = self.engine.compute_visuals(
                self.state.params, A, B, key)
            self._visuals_cache = visuals

    def get_current_visuals(self) -> OrderedDict:
        self.compute_visuals()
        out = OrderedDict()
        for name in self.visual_names:
            if self._visuals_cache and name in self._visuals_cache:
                out[name] = np.asarray(self._visuals_cache[name])
        return out

    def get_image_paths(self):
        return self.image_paths

    # -------------------------------------------------------- checkpoints

    def save_networks(self, epoch):
        params = {k: v for k, v in self.state.params.items()
                  if k in self.model_names}
        ckpt.save_networks(
            self.save_dir, epoch, params,
            opt_extras={"opt_state": self.state.opt_state,
                        "step": self.state.step})

    def _pth_converter(self, name, state_dict):
        from dfmir_tpu.compat import convert

        cfg = self.cfg
        if name == "G":
            specs = resnet_generator_specs(
                input_nc=cfg.input_nc, output_nc=cfg.output_nc, ngf=cfg.ngf,
                n_blocks=cfg.n_blocks, no_antialias=cfg.no_antialias,
                no_antialias_up=cfg.no_antialias_up)
            return convert.convert_netG(
                state_dict, specs, use_dropout=not cfg.no_dropout)
        if name == "R":
            return convert.convert_netR(
                state_dict, enc_nf=cfg.vxm_enc, dec_nf=cfg.vxm_dec)
        if name == "F":
            return convert.convert_netF(
                state_dict, n_layers=len(cfg.nce_layers))
        raise KeyError(name)

    def load_networks(self, epoch):
        """Reference load semantics incl. --pretrained_name cross-experiment
        warm start (base_model.py:196-224); also restores optimizer state
        when present (an improvement — the reference resets Adam moments)."""
        pretrained = getattr(self.opt, "pretrained_name", None)
        load_dir = (os.path.join(self.opt.checkpoints_dir, pretrained)
                    if pretrained else self.save_dir)
        loaded = ckpt.load_networks(
            load_dir, epoch, self.model_names,
            templates=self.state.params,
            verbose=getattr(self.opt, "verbose", False),
            pth_converter=self._pth_converter)
        params = dict(self.state.params)
        params.update(loaded)
        opt_state = self.state.opt_state
        optim = ckpt.load_optim(
            load_dir, epoch,
            {"opt_state": self.state.opt_state, "step": self.state.step})
        step = self.state.step
        if optim is not None and set(self.model_names) >= \
                set(self.state.params.keys()):
            opt_state, step = optim["opt_state"], optim["step"]
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=step)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)

    # ----------------------------------------------------------------- lr

    def update_learning_rate(self):
        old = self.schedule.current_lr()
        new = self.schedule.step(self.metric)
        print(f"learning rate {old:.7f} -> {new:.7f}")
