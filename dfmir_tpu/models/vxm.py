"""CLI task for pure volumetric registration (``--model vxm``): classic
VoxelMorph training over paired 3-D volumes (``--dataset_mode volume``),
exposing the same lifecycle surface as the paper model so train.py / test.py
drive it unchanged.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import checkpoints as ckpt
from dfmir_tpu.engine.schedules import LRSchedule
from dfmir_tpu.engine.vxm_engine import VxmConfig, VxmEngine, VxmState
from dfmir_tpu.parallel import make_mesh, replicate, shard_batch
from dfmir_tpu.utils.util import str2bool


class VxmTask:
    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.add_argument("--ndims", type=int, default=3)
        parser.add_argument("--image_loss", type=str, default="ncc",
                            choices=["ncc", "mse"])
        parser.add_argument("--ncc_win", type=int, default=9)
        parser.add_argument("--lambda_smooth", type=float, default=0.01)
        parser.add_argument("--int_steps", type=int, default=7)
        parser.add_argument("--int_downsize", type=int, default=2)
        parser.add_argument("--bidir", type=str2bool, nargs="?", const=True,
                            default=False)
        parser.add_argument("--remat", type=str2bool, nargs="?", const=True,
                            default=False,
                            help="rematerialize the UNet in backward "
                                 "(O(1) activation memory for 160^3)")
        parser.add_argument("--enc", type=str, default="16,32,32,32")
        parser.add_argument("--dec", type=str,
                            default="32,32,32,32,32,16,16")
        parser.set_defaults(dataset_mode="volume", lr=1e-4)
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.isTrain = getattr(opt, "isTrain", False)
        self.cfg = VxmConfig.from_opt(opt)
        self.engine = VxmEngine(self.cfg)
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.save_dir, exist_ok=True)
        self.loss_names = ["sim", "smooth", "total"]
        self.visual_names = ["source", "target", "registered"]
        self.model_names = ["R"]
        self.rng = jax.random.PRNGKey(int(getattr(opt, "seed", 0) or 0))
        self.state: VxmState = None
        self.mesh = None
        self.schedule = LRSchedule(opt) if self.isTrain else None
        self.metric = 0.0
        self._losses = {}
        self._batch = None

    # lifecycle ----------------------------------------------------------
    def data_dependent_initialize(self, data=None):
        if self.state is None:
            self.rng, key = jax.random.split(self.rng)
            self.state = self.engine.init_state(key)

    def setup(self, opt):
        self.data_dependent_initialize()
        if (self.isTrain and getattr(opt, "continue_train", False)) \
                or not self.isTrain:
            self.load_networks(opt.epoch)

    def parallelize(self):
        n = len(jax.devices())
        if n > 1 and self.cfg.batch_size % n == 0:
            self.mesh = make_mesh(n_data=n)
            self.state = replicate(self.mesh, self.state)

    def eval(self):
        pass

    # steps ---------------------------------------------------------------
    def set_input(self, batch):
        A = np.asarray(batch["A"], np.float32)
        B = np.asarray(batch["B"], np.float32)
        if self.mesh is not None:
            A, B = shard_batch(self.mesh, (A, B), ndims=self.cfg.ndims)
        else:
            A, B = jnp.asarray(A), jnp.asarray(B)
        self._batch = (A, B)
        self.image_paths = batch.get("A_paths")

    def optimize_parameters(self):
        A, B = self._batch
        lr = jnp.float32(self.schedule.current_lr())
        self.state, self._losses = self.engine.train_step(
            self.state, A, B, lr)

    def test(self):
        A, B = self._batch
        self._losses = self.engine.eval_step(self.state.params, A, B)

    def register_pair(self, A=None, B=None):
        if A is None:
            A, B = self._batch
        y_source, pos_flow = self.engine.register(self.state.params, A, B)
        return y_source, pos_flow

    def registration_stats(self):
        """Scalar deformation-health stats on the current batch (folding
        fraction, |J| range, max displacement) — logged on --jac_freq."""
        A, B = self._batch
        stats = self.engine.flow_stats(self.state.params, A, B)
        return OrderedDict((k, float(v)) for k, v in stats.items())

    # accessors -----------------------------------------------------------
    def get_current_losses(self) -> OrderedDict:
        return OrderedDict((k, float(self._losses[k]))
                           for k in self.loss_names if k in self._losses)

    def compute_visuals(self):
        pass

    def get_current_visuals(self) -> OrderedDict:
        """Mid-depth slices, mapped to [-1,1] for the shared tensor2im."""
        A, B = self._batch
        y_source, _ = self.register_pair()

        def mid_slice(v):
            v = np.asarray(v)
            if self.cfg.ndims == 3:
                v = v[:, v.shape[1] // 2]
            return v * 2.0 - 1.0

        return OrderedDict([("source", mid_slice(A)),
                            ("target", mid_slice(B)),
                            ("registered", mid_slice(y_source))])

    def get_image_paths(self):
        return self.image_paths

    # checkpoints ---------------------------------------------------------
    def save_networks(self, epoch):
        ckpt.save_networks(
            self.save_dir, epoch, {"R": self.state.params},
            opt_extras={"opt_state": self.state.opt_state,
                        "step": self.state.step})

    def load_networks(self, epoch):
        loaded = ckpt.load_networks(
            self.save_dir, epoch, ["R"], templates={"R": self.state.params})
        opt_state, step = self.state.opt_state, self.state.step
        optim = ckpt.load_optim(
            self.save_dir, epoch,
            {"opt_state": self.state.opt_state, "step": self.state.step})
        if optim is not None:
            opt_state, step = optim["opt_state"], optim["step"]
        self.state = VxmState(params=loaded["R"], opt_state=opt_state,
                              step=step)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)

    def update_learning_rate(self):
        old = self.schedule.current_lr()
        new = self.schedule.step(self.metric)
        print(f"learning rate {old:.7f} -> {new:.7f}")
