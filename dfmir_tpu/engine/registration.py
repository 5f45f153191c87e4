"""The registration training engine (the paper model, TPU-native).

Replicates REGISTRATIONModel.optimize_parameters
(/root/reference/models/registration_model.py:138-171) as ONE jitted train
step: translate (netG) -> register (netR) -> warp -> PatchNCE + masked-L1 +
local-NCE + smoothness -> a single backward through all three networks ->
three simultaneous Adam updates (mathematically identical to the reference's
three optimizers stepping on one shared backward, since Adam is elementwise
and all three share hyperparameters).

Design deltas from the reference (TPU-first):
- netF's MLPs have static shapes, so there is no data_dependent_initialize
  two-phase setup; params exist from ``init_state``.
- the per-step PIL load of ./deform256.jpg (reference :148) becomes a
  procedural constant grid image warped only in ``compute_visuals``.
- all six NCE encoder passes are batched into one generator apply
  (``fuse_nce_encodes``) — exact for per-sample ops (instance norm).
- RNG is explicit: patch ids / flip coins come from a threaded jax PRNG key.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.struct
import optax

from dfmir_tpu.engine.config import RegistrationConfig
from dfmir_tpu.losses import (
    gan_loss, masked_l1, patch_nce_loss, smoothness_loss,
)
from dfmir_tpu.nets import VxmDense, nce_feature_dims
from dfmir_tpu.ops import folding_fraction, jacobian_det, warp


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def grid_image(size: int, spacing: int = 16, thickness: int = 1) -> np.ndarray:
    """Procedural grid image in [-1, 1] (replaces ./deform256.jpg)."""
    img = np.ones((size, size), np.float32)
    for start in range(0, size, spacing):
        img[start:start + thickness, :] = -1.0
        img[:, start:start + thickness] = -1.0
    return img[None, :, :, None]


class RegistrationModel:
    """Builds the three networks and exposes jitted train/eval steps."""

    # netG family -> apply-protocol quirks (dropout 'train' kwarg support)
    _FAMILIES = {"resnet", "unet", "munit", "stylegan2"}

    def __init__(self, cfg: RegistrationConfig):
        self.cfg = cfg
        # ALL net construction goes through the define_G/define_F/define_D
        # factories (reference define_* at networks.py:218-375 are the only
        # construction path, registration_model.py:91-92); unknown choices
        # raise NotImplementedError from the factory.
        from dfmir_tpu.nets.factory import define_F, define_G

        self.netG = define_G(
            input_nc=cfg.input_nc, output_nc=cfg.output_nc, ngf=cfg.ngf,
            netG=cfg.netG, norm=cfg.normG, use_dropout=not cfg.no_dropout,
            init_type=cfg.init_type, init_gain=cfg.init_gain,
            no_antialias=cfg.no_antialias, no_antialias_up=cfg.no_antialias_up,
            size=cfg.crop_size,
            stylegan2_num_downsampling=cfg.stylegan2_G_num_downsampling)
        if cfg.netG.startswith("resnet_") and cfg.netG.endswith("blocks"):
            self._g_family = "resnet"
        elif cfg.netG.startswith("unet"):
            self._g_family = "unet"
        elif cfg.netG == "resnet_cat":
            self._g_family = "munit"
        else:
            self._g_family = "stylegan2"

        if self._g_family == "resnet":
            dims = nce_feature_dims(
                cfg.nce_layers, input_nc=cfg.input_nc,
                output_nc=cfg.output_nc, ngf=cfg.ngf, n_blocks=cfg.n_blocks,
                no_antialias=cfg.no_antialias,
                no_antialias_up=cfg.no_antialias_up,
            )
        else:
            dims = ()  # PatchSampleF derives MLP widths from inputs at init
        self._f_extra_vars = {}
        strided_specs = None
        if cfg.netF == "strided_conv":
            shapes = self._tap_shapes()
            strided_specs = [(int(s.shape[-1]), int(s.shape[1]))
                             for s in shapes]
        self.netF = define_F(
            netF=cfg.netF, netF_nc=cfg.netF_nc, feature_dims=tuple(dims),
            strided_specs=strided_specs, init_type=cfg.init_type,
            init_gain=cfg.init_gain)
        if cfg.netF == "strided_conv":
            feats0 = [jnp.zeros(s.shape, jnp.float32) for s in shapes]
            vs = self.netF.init(jax.random.PRNGKey(0), feats0)
            # EMA centering stats: held as zeros constants (update_ema is
            # off inside the jitted loss; see _apply_F)
            self._f_extra_vars = {k: v for k, v in vs.items()
                                  if k != "params"}
        if cfg.netR == "vxm":
            self.netR = VxmDense(
                ndims=cfg.ndims,
                nb_features=(tuple(cfg.vxm_enc), tuple(cfg.vxm_dec)),
                int_steps=cfg.int_steps, int_downsize=cfg.int_downsize,
                bidir=True, compute_dtype=cfg.compute_dtype,
            )
        elif cfg.netR in ("vxm_transformer", "vxm_dual"):
            from dfmir_tpu.nets.transfusion import VxmDenseTransformer

            self.netR = VxmDenseTransformer(
                ndims=cfg.ndims,
                nb_features=(tuple(cfg.vxm_enc), tuple(cfg.vxm_dec)),
                int_steps=cfg.int_steps, int_downsize=cfg.int_downsize,
                bidir=True,
                fuse="gpt" if cfg.netR == "vxm_transformer" else "none",
            )
        else:
            raise NotImplementedError(f"netR {cfg.netR}")
        self.netD = None
        if cfg.lambda_GAN > 0:
            from dfmir_tpu.nets import define_D

            self.netD = define_D(
                input_nc=cfg.output_nc, ndf=cfg.ndf, netD=cfg.netD,
                n_layers_D=cfg.n_layers_D, norm=cfg.normD,
                init_type=cfg.init_type, init_gain=cfg.init_gain,
                no_antialias=cfg.no_antialias)
        self.tx = optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
        self.tx_d = optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)
        self._grid_const = jnp.asarray(grid_image(cfg.crop_size))

    # ------------------------------------------------------------- setup

    def _dummy_batch(self, batch_size: Optional[int] = None):
        cfg = self.cfg
        b = batch_size or cfg.batch_size
        spatial = (cfg.crop_size,) * cfg.ndims
        a = jnp.zeros((b,) + spatial + (cfg.input_nc,), jnp.float32)
        return a, a

    def init_state(self, rng, batch_size: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        kG, kF, kR, kS = jax.random.split(rng, 4)
        A, B = self._dummy_batch(batch_size)
        init_rngs = {"params": kG}
        if not cfg.no_dropout:
            init_rngs["dropout"] = jax.random.fold_in(kG, 3)
        pG = self.netG.init(init_rngs, A)["params"]
        feats = self._encode(pG, A, rng=jax.random.fold_in(kG, 4))
        pF = self._init_F(kF, feats, kS)
        pR = self.netR.init(kR, A, B)["params"]
        params = {"G": pG, "F": pF, "R": pR}
        if self.netD is None:
            opt_state = self.tx.init(params)
        else:
            pD = self.netD.init(jax.random.fold_in(kG, 7), A)["params"]
            opt_state = (self.tx.init(params), self.tx_d.init(pD))
            params = dict(params, D=pD)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------- losses

    # bf16 compute: params + activations feed the MXU in bfloat16 (2x rate,
    # half the HBM traffic); losses, masks, and all flow-field math stay in
    # f32 (see VxmDense.compute_dtype).  Master params remain f32.
    def _ct(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def _cast_params(self, p):
        if self.cfg.compute_dtype == "float32":
            return p
        dt = self._ct()
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, p)

    def _g_rngs(self, rng=None):
        """Dropout rng collection (only when --no_dropout false)."""
        if self.cfg.no_dropout or rng is None:
            return {}
        return {"dropout": rng}

    def _g_kwargs(self, train=True):
        """Per-family generator kwargs: resnet/unet take a ``train`` flag
        (dropout); munit (resnet_cat) and stylegan2 have none."""
        if self._g_family in ("resnet", "unet"):
            return {"train": train and not self.cfg.no_dropout}
        return {}

    def _tap_shapes(self):
        """ShapeDtypeStructs of the tapped NCE activations, by abstract
        tracing — no compute, works for every netG family."""
        cfg = self.cfg
        spatial = (cfg.crop_size,) * cfg.ndims
        x0 = jnp.zeros((1,) + spatial + (cfg.input_nc,), jnp.float32)
        kw = self._g_kwargs(train=False)

        def probe(x):
            out, _ = self.netG.init_with_output(
                jax.random.PRNGKey(0), x, layers=cfg.nce_layers,
                encode_only=True, **kw)
            return out

        return jax.eval_shape(probe, x0)

    def _apply_G(self, pG, x, rng=None, train=True):
        out = self.netG.apply({"params": self._cast_params(pG)},
                              x.astype(self._ct()),
                              rngs=self._g_rngs(rng if train else None),
                              **self._g_kwargs(train))
        return out.astype(jnp.float32)

    def _encode(self, pG, x, rng=None, train=True):
        feats = self.netG.apply(
            {"params": self._cast_params(pG)}, x.astype(self._ct()),
            layers=self.cfg.nce_layers, encode_only=True,
            rngs=self._g_rngs(rng if train else None),
            **self._g_kwargs(train))
        return [f.astype(jnp.float32) for f in feats]

    def _forward_and_taps(self, pG, x, rng=None, train=True):
        """One generator pass returning (output, tapped encoder feats) —
        the reference's separate encode of the *source* images
        (calculate_NCE_loss's feat_k, registration_model.py:246) recomputes
        activations the forward pass already produced; tapping them here
        saves those passes exactly (per-sample ops only, so batch-stacking
        changes nothing)."""
        out, feats = self.netG.apply(
            {"params": self._cast_params(pG)}, x.astype(self._ct()),
            layers=self.cfg.nce_layers,
            rngs=self._g_rngs(rng if train else None),
            **self._g_kwargs(train))
        return out.astype(jnp.float32), [f.astype(jnp.float32) for f in feats]

    # ----------------------------------------------------------- netF
    def _init_F(self, key, feats, rng):
        """Initialize the projection head on real tapped feats (replaces
        the reference's lazy data_dependent_initialize)."""
        netF = self.cfg.netF
        if netF in ("sample", "mlp_sample"):
            return self.netF.init(
                key, feats, self.cfg.num_patches, None,
                rng=rng).get("params", {})
        if netF == "strided_conv":
            return self.netF.init(key, feats).get("params", {})
        # global_pool / reshape are parameterless per-feature modules
        return self.netF.init(key, feats[0]).get("params", {})

    def _apply_F(self, pF, feats, num_patches, patch_ids, rng=None):
        """netF protocol adapter: every --netF choice maps a list of
        tapped feature maps to (list of (B*P, C) L2-normalized patch
        embeddings, sample_ids).  In the reference only sample/mlp_sample
        fit the NCE call signature (networks.py:505-572 take a single
        tensor and crash inside calculate_NCE_loss); here the alternates
        are adapted: global_pool pools each map to one embedding per image,
        reshape pools to a 4x4 grid (16 per image), strided_conv projects
        each map and treats every output location as a patch (its EMA
        centering is frozen at zero inside the jitted loss)."""
        netF = self.cfg.netF
        if netF in ("sample", "mlp_sample"):
            return self.netF.apply({"params": pF}, feats, num_patches,
                                   patch_ids, rng=rng)
        if netF == "strided_conv":
            outs = self.netF.apply(dict({"params": pF},
                                        **self._f_extra_vars),
                                   feats, update_ema=False)
            return [o.reshape(-1, o.shape[-1]) for o in outs], None
        if netF == "global_pool":
            return [self.netF.apply({"params": pF}, f).reshape(
                f.shape[0], -1) for f in feats], None
        if netF == "reshape":
            return [self.netF.apply({"params": pF}, f)
                    for f in feats], None
        raise NotImplementedError(f"netF {netF}")

    def _nce_from_feats(self, pF, feat_q, feat_k, rng, batch_size,
                        flip_q=None):
        """calculate_NCE_loss core (registration_model.py:237-253) given
        pre-computed feature taps.  flip_q: traced bool — FastCUT flip
        equivariance flips the query features back along W
        (registration_model.py:241-242; applied to every NCE call when the
        step's coin landed on flip, exactly as the reference does)."""
        cfg = self.cfg
        if flip_q is not None:
            feat_q = [jnp.where(flip_q, jnp.flip(f, axis=2), f)
                      for f in feat_q]
        feat_k_pool, ids = self._apply_F(
            pF, feat_k, cfg.num_patches, None, rng=rng)
        feat_q_pool, _ = self._apply_F(
            pF, feat_q, cfg.num_patches, patch_ids=ids)
        total = 0.0
        for f_q, f_k in zip(feat_q_pool, feat_k_pool):
            per_patch = patch_nce_loss(
                f_q, f_k, nce_T=cfg.nce_T, batch_size=batch_size,
                all_negatives_from_minibatch=(
                    cfg.nce_includes_all_negatives_from_minibatch),
            )
            total = total + jnp.mean(per_patch) * cfg.lambda_NCE
        return total / len(cfg.nce_layers)

    def _step_keys(self, rng):
        """One derivation shared by _loss_fn and the GAN phase-1 D update,
        so both phases see the SAME flip coin and dropout masks (the
        reference computes fake_B once in forward() and reuses it for both
        compute_D_loss and compute_G_loss)."""
        kF1, kF2, kF3, kFlip, kDrop = jax.random.split(rng, 5)
        return (kF1, kF2, kF3), kFlip, kDrop

    def _loss_fn(self, params, real_A, real_B, rng, d_params=None):
        cfg = self.cfg
        B = real_A.shape[0]
        (kF1, kF2, kF3), kFlip, kDrop = self._step_keys(rng)

        # forward() (registration_model.py:185-196); FastCUT flip
        # equivariance flips the generator input along W with p=0.5 (:188-190)
        real = jnp.concatenate([real_A, real_B], axis=0)
        flipped = None
        if cfg.flip_equivariance:
            flipped = jax.random.bernoulli(kFlip)
            real = jnp.where(flipped, jnp.flip(real, axis=2), real)

        # With flip equivariance the key images (unflipped real_A/real_B)
        # differ from the generator's (flipped) input, so forward taps
        # cannot stand in for the key encodes; fall back to the stacked
        # re-encode path.  Dropout note: reusing forward taps draws the key
        # activations under the forward pass's dropout masks instead of a
        # fresh encode's — same distribution, fewer passes.
        reuse_taps = cfg.fuse_nce_encodes and not cfg.flip_equivariance
        feats_fwd = None
        if reuse_taps:
            fake, feats_fwd = self._forward_and_taps(params["G"], real,
                                                     rng=kDrop)
        else:
            fake = self._apply_G(params["G"], real, rng=kDrop)
        fake_B = fake[:B]
        idt_B = fake[B:]

        # netR forward (bidir): returns integrated full-res pos_flow
        y_source, y_target, pos_flow = self.netR.apply(
            {"params": self._cast_params(params["R"])}, real_A, real_B)
        registered = warp(fake_B, pos_flow)

        # --- NCE losses.
        use_idt = cfg.nce_idt and cfg.lambda_NCE > 0
        if reuse_taps:
            # Keys come from the forward taps; only the three query images
            # (fake_B [, idt_B], y_source) need an encoder pass, batched
            # into one apply.
            feats_A = [f[:B] for f in feats_fwd]
            feats_B = [f[B:] for f in feats_fwd]
            q_imgs = [fake_B] + ([idt_B] if use_idt else []) + [y_source]
            q_feats = self._encode(params["G"],
                                   jnp.concatenate(q_imgs, axis=0),
                                   rng=jax.random.fold_in(kDrop, 1))
            q_chunks = [[f[i * B:(i + 1) * B] for f in q_feats]
                        for i in range(len(q_imgs))]
            k_chunks = [feats_A] + ([feats_B] if use_idt else []) + [feats_B]
            keys = [kF1, kF2, kF3] if use_idt else [kF1, kF3]
            nce_vals = [
                self._nce_from_feats(params["F"], q, k, key, B,
                                     flip_q=flipped)
                for q, k, key in zip(q_chunks, k_chunks, keys)
            ]
        elif cfg.fuse_nce_encodes:
            pairs = [(fake_B, real_A)]  # (query, key) per NCE call
            if cfg.nce_idt and cfg.lambda_NCE > 0:
                pairs.append((idt_B, real_B))
            pairs.append((y_source, real_B))  # loss_local
            stacked = jnp.concatenate(
                [x for q, k in pairs for x in (q, k)], axis=0)
            feats = self._encode(params["G"], stacked,
                                 rng=jax.random.fold_in(kDrop, 1))
            # split each tapped activation back into per-pair q/k chunks
            chunks = [
                [f[i * B:(i + 1) * B] for f in feats]
                for i in range(2 * len(pairs))
            ]
            nce_vals = []
            keys = [kF1, kF2, kF3]
            for p in range(len(pairs)):
                nce_vals.append(self._nce_from_feats(
                    params["F"], chunks[2 * p], chunks[2 * p + 1],
                    keys[p], B, flip_q=flipped))
        else:
            nce_vals = [self._nce_from_feats(
                params["F"], self._encode(params["G"], fake_B),
                self._encode(params["G"], real_A), kF1, B,
                flip_q=flipped)]
            if cfg.nce_idt and cfg.lambda_NCE > 0:
                nce_vals.append(self._nce_from_feats(
                    params["F"], self._encode(params["G"], idt_B),
                    self._encode(params["G"], real_B), kF2, B,
                    flip_q=flipped))
            nce_vals.append(self._nce_from_feats(
                params["F"], self._encode(params["G"], y_source),
                self._encode(params["G"], real_B), kF3, B,
                flip_q=flipped))

        loss_NCE = nce_vals[0]
        if cfg.nce_idt and cfg.lambda_NCE > 0:
            loss_NCE_Y = nce_vals[1]
            loss_G = (loss_NCE + loss_NCE_Y) * 0.5
        else:
            loss_NCE_Y = jnp.zeros(())
            loss_G = loss_NCE
        loss_local_nce = nce_vals[-1]

        # GAN term for G (reference compute_G_loss :217-219).  d_params are
        # not differentiated here — D gets its own loss in train_step.
        loss_G_GAN = jnp.zeros(())
        if cfg.lambda_GAN > 0 and d_params is not None:
            pred_fake = self.netD.apply({"params": d_params}, fake_B)
            loss_G_GAN = gan_loss(pred_fake, True,
                                  cfg.gan_mode) * cfg.lambda_GAN
        loss_G = loss_G + loss_G_GAN

        # R losses (registration_model.py:160-165).  Masks are boolean ORs of
        # foreground tests (torch bool + bool == logical or).
        mask = (real_B > -0.95) | (registered > -0.95)
        mask2 = (idt_B > -0.95) | (registered > -0.95)
        loss_local = loss_local_nce * cfg.local_weight
        loss_R = (
            masked_l1(registered, real_B, mask)
            + masked_l1(idt_B, registered, mask2)
            + loss_local
        )
        loss_smooth = smoothness_loss(pos_flow) * cfg.smooth_weight

        total = loss_R + loss_G + loss_smooth
        metrics = {
            "G": loss_G, "NCE": loss_NCE, "R": loss_R,
            "smooth": loss_smooth, "local": loss_local, "total": total,
        }
        if cfg.nce_idt:
            metrics["NCE_Y"] = loss_NCE_Y
        if cfg.lambda_GAN > 0:
            metrics["G_GAN"] = loss_G_GAN
        aux = {"fake_B": fake_B, "idt_B": idt_B, "registered": registered,
               "regA": y_source, "pos_flow": pos_flow}
        return total, (metrics, aux)

    # -------------------------------------------------------------- steps

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, real_A, real_B, rng, lr):
        """One optimization step; lr is a traced scalar (host schedules it).

        ``state`` is DONATED: params + Adam moments are updated in place on
        device (halves the optimizer-state HBM footprint of the step and
        removes the copy XLA would otherwise emit for each updated leaf).
        Callers must use the linear pattern ``state, m = train_step(state,
        ...)`` — the old state's buffers are deleted afterwards (on every
        backend, including XLA:CPU).  Callers that need the pre-step state
        must snapshot it (``jax.tree.map(jnp.copy, state)``) BEFORE the
        call.  Donation is a no-op when this step is inlined inside an
        outer trace (bench/profile chains).

        With lambda_GAN > 0 this is the reference's two-phase step
        (registration_model.py:138-171 with the D branch): update D on
        detached fakes first, then update G/F/R against the updated D."""
        if self.netD is None:
            grads, (metrics, _) = jax.grad(
                self._loss_fn, has_aux=True)(
                    state.params, real_A, real_B, rng)
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(params=new_params, opt_state=new_opt,
                              step=state.step + 1), metrics

        cfg = self.cfg
        B = real_A.shape[0]
        gfr = {k: state.params[k] for k in ("G", "F", "R")}
        pD = state.params["D"]
        opt_gfr, opt_d = state.opt_state

        # --- phase 1: D on detached fakes (compute_D_loss, :198-211).
        # Derive the SAME flip coin + dropout key as _loss_fn so this is
        # the reference's single forward(): D sees exactly the fake_B that
        # phase 2's G loss uses (XLA CSEs the duplicated forward).  G runs
        # in train mode (dropout active), matching the reference, which
        # never calls netG.eval() inside optimize_parameters.
        _, kFlip, kDrop = self._step_keys(rng)
        real = jnp.concatenate([real_A, real_B], axis=0)
        if cfg.flip_equivariance:
            flipped = jax.random.bernoulli(kFlip)
            real = jnp.where(flipped, jnp.flip(real, axis=2), real)
        fake_B = jax.lax.stop_gradient(
            self._apply_G(state.params["G"], real, rng=kDrop)[:B])

        def d_loss(pd):
            pred_fake = self.netD.apply({"params": pd}, fake_B)
            pred_real = self.netD.apply({"params": pd}, real_B)
            l_fake = gan_loss(pred_fake, False, cfg.gan_mode)
            l_real = gan_loss(pred_real, True, cfg.gan_mode)
            return (l_fake + l_real) * 0.5, (l_fake, l_real)

        (loss_D, (l_df, l_dr)), gD = jax.value_and_grad(
            d_loss, has_aux=True)(pD)
        updD, opt_d = self.tx_d.update(gD, opt_d, pD)
        pD = optax.apply_updates(pD, jax.tree.map(lambda u: -lr * u, updD))

        # --- phase 2: G/F/R against the updated D
        grads, (metrics, _) = jax.grad(self._loss_fn, has_aux=True)(
            gfr, real_A, real_B, rng, d_params=pD)
        upd, opt_gfr = self.tx.update(grads, opt_gfr, gfr)
        gfr = optax.apply_updates(
            gfr, jax.tree.map(lambda u: -lr * u, upd))

        metrics = dict(metrics)
        metrics.update({"D": loss_D, "D_fake": l_df, "D_real": l_dr})
        new_params = dict(gfr)
        new_params["D"] = pD
        return TrainState(params=new_params, opt_state=(opt_gfr, opt_d),
                          step=state.step + 1), metrics

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, params, real_A, real_B, rng):
        """Losses + outputs without an update (reference model.test())."""
        _, (metrics, aux) = self._loss_fn(params, real_A, real_B, rng)
        return metrics, aux

    @functools.partial(jax.jit, static_argnums=0)
    def register(self, params, real_A, real_B):
        """Inference (test.py path): translation + registration=True.

        Returns (fake_B, idt_B, y_source, pos_flow)."""
        B = real_A.shape[0]
        real = jnp.concatenate([real_A, real_B], axis=0)
        fake = self._apply_G(params["G"], real, train=False)
        y_source, pos_flow = self.netR.apply(
            {"params": self._cast_params(params["R"])}, real_A, real_B,
            registration=True)
        return fake[:B], fake[B:], y_source, pos_flow

    @functools.partial(jax.jit, static_argnums=0)
    def compute_visuals(self, params, real_A, real_B, rng):
        """The reference visual set (registration_model.py:78): real_A,
        fake_B, real_B, dvf, registered, regA (+ idt_B)."""
        _, (metrics, aux) = self._loss_fn(params, real_A, real_B, rng)
        grid = jnp.tile(self._grid_const, (real_A.shape[0], 1, 1, 1))
        dvf = warp(grid, aux["pos_flow"])
        visuals = {
            "real_A": real_A, "fake_B": aux["fake_B"], "real_B": real_B,
            "dvf": dvf, "registered": aux["registered"], "regA": aux["regA"],
        }
        if self.cfg.nce_idt:
            visuals["idt_B"] = aux["idt_B"]
        return visuals, metrics

    @functools.partial(jax.jit, static_argnums=0)
    def registration_metrics(self, params, real_A, real_B):
        """Offline metrics: Jacobian determinant map + folding fraction."""
        _, _, _, pos_flow = self.register(params, real_A, real_B)
        det = jacobian_det(pos_flow)
        return {"jac_det": det, "folding_fraction": folding_fraction(pos_flow)}

    @functools.partial(jax.jit, static_argnums=0)
    def flow_stats(self, params, real_A, real_B):
        """Scalar field-health stats for in-training logging (--jac_freq):
        everything stays on device; only scalars cross the (slow) D2H link."""
        _, _, _, pos_flow = self.register(params, real_A, real_B)
        det = jacobian_det(pos_flow)
        return {
            "fold": jnp.mean(folding_fraction(pos_flow)),  # (B,) -> scalar
            "jac_min": jnp.min(det), "jac_max": jnp.max(det),
            "jac_mean": jnp.mean(det),
            "flow_max": jnp.max(jnp.abs(pos_flow)),
        }
