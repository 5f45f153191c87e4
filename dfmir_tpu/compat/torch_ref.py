"""Independent PyTorch implementation of the DFMIR architectures.

Written from the architectural description in SURVEY.md / the reference's
documented behavior (NOT copied): used as the golden model for parity tests,
as the source of reference-format state_dicts for the checkpoint converter
(key names intentionally match the reference's module paths, e.g.
``model.1.weight``, ``unet_model.downarm.0.main.weight`` — that naming is the
compatibility interface), and as the PyTorch-CPU baseline in bench.py.

Architecture summary (see /root/reference/models/networks.py:956-1051,
models/voxelmorph/torchvoxelmorph/networks.py:9-106,1028-1145):
ResnetGenerator = c7s1-64 + 2 antialiased downsamples + 9 ResNet blocks +
2 antialiased upsamples + c7s1-1 + tanh, instance norm; VxmDense = strided
UNet -> 3x3 flow conv (N(0,1e-5)) -> half-res scaling-and-squaring -> warp.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- filters

def _binomial(n):
    a = np.array([1.0])
    for _ in range(n - 1):
        a = np.convolve(a, [1.0, 1.0])
    return a


def _filter2d(n):
    a = torch.from_numpy(_binomial(n)).float()
    f = a[:, None] * a[None, :]
    return f / f.sum()


class BlurDown(nn.Module):
    def __init__(self, channels, filt_size=3, stride=2):
        super().__init__()
        self.stride = stride
        self.filt_size = filt_size
        lo = (filt_size - 1) // 2
        hi = int(np.ceil((filt_size - 1) / 2))
        self.pads = (lo, hi, lo, hi)
        self.register_buffer(
            "filt", _filter2d(filt_size)[None, None].repeat(channels, 1, 1, 1)
        )

    def forward(self, x):
        x = F.pad(x, self.pads, mode="reflect")
        return F.conv2d(x, self.filt, stride=self.stride, groups=x.shape[1])


class BlurUp(nn.Module):
    def __init__(self, channels, filt_size=4, stride=2):
        super().__init__()
        self.stride = stride
        self.filt_odd = filt_size % 2 == 1
        self.pad_size = (filt_size - 1) // 2
        self.register_buffer(
            "filt",
            _filter2d(filt_size)[None, None].repeat(channels, 1, 1, 1)
            * stride ** 2,
        )

    def forward(self, x):
        x = F.pad(x, (1, 1, 1, 1), mode="replicate")
        out = F.conv_transpose2d(
            x, self.filt, stride=self.stride, padding=1 + self.pad_size,
            groups=x.shape[1],
        )[:, :, 1:, 1:]
        return out if self.filt_odd else out[:, :, :-1, :-1]


# ------------------------------------------------------------- generator

class RefResnetBlock(nn.Module):
    def __init__(self, dim, use_dropout=False):
        super().__init__()
        layers = [
            nn.ReflectionPad2d(1),
            nn.Conv2d(dim, dim, 3, bias=True),
            nn.InstanceNorm2d(dim),
            nn.ReLU(True),
        ]
        if use_dropout:
            layers.append(nn.Dropout(0.5))
        layers += [
            nn.ReflectionPad2d(1),
            nn.Conv2d(dim, dim, 3, bias=True),
            nn.InstanceNorm2d(dim),
        ]
        self.conv_block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv_block(x)


class RefResnetGenerator(nn.Module):
    """state_dict keys match the reference's netG ('model.<i>...')."""

    def __init__(self, input_nc=1, output_nc=1, ngf=64, n_blocks=9):
        super().__init__()
        m = [
            nn.ReflectionPad2d(3),
            nn.Conv2d(input_nc, ngf, 7, bias=True),
            nn.InstanceNorm2d(ngf),
            nn.ReLU(True),
        ]
        for i in range(2):
            mult = 2 ** i
            m += [
                nn.Conv2d(ngf * mult, ngf * mult * 2, 3, stride=1, padding=1,
                          bias=True),
                nn.InstanceNorm2d(ngf * mult * 2),
                nn.ReLU(True),
                BlurDown(ngf * mult * 2),
            ]
        for _ in range(n_blocks):
            m.append(RefResnetBlock(ngf * 4))
        for i in range(2):
            mult = 2 ** (2 - i)
            m += [
                BlurUp(ngf * mult),
                nn.Conv2d(ngf * mult, ngf * mult // 2, 3, stride=1, padding=1,
                          bias=True),
                nn.InstanceNorm2d(ngf * mult // 2),
                nn.ReLU(True),
            ]
        m += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7), nn.Tanh()]
        self.model = nn.Sequential(*m)

    def forward(self, x, layers=None, encode_only=False):
        if not layers:
            return self.model(x)
        feats = []
        h = x
        for i, layer in enumerate(self.model):
            h = layer(h)
            if i in layers:
                feats.append(h)
            if encode_only and i == layers[-1]:
                return feats
        return h, feats


# ----------------------------------------------------------- registration

class RefSTN(nn.Module):
    def __init__(self, size, mode="bilinear"):
        super().__init__()
        self.mode = mode
        grids = torch.meshgrid(*[torch.arange(s) for s in size], indexing="ij")
        self.register_buffer("grid", torch.stack(grids).float()[None])

    def forward(self, src, flow):
        locs = self.grid + flow
        shape = flow.shape[2:]
        nd = len(shape)
        locs = torch.stack(
            [2 * (locs[:, i] / (shape[i] - 1) - 0.5) for i in range(nd)], dim=1
        )
        if nd == 2:
            locs = locs.permute(0, 2, 3, 1)[..., [1, 0]]
        else:
            locs = locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
        return F.grid_sample(src, locs, align_corners=True, mode=self.mode)


class RefVecInt(nn.Module):
    def __init__(self, inshape, nsteps=7):
        super().__init__()
        self.nsteps = nsteps
        self.stn = RefSTN(inshape)

    def forward(self, vec):
        vec = vec * (1.0 / 2 ** self.nsteps)
        for _ in range(self.nsteps):
            vec = vec + self.stn(vec, vec)
        return vec


def _resize_flow_torch(x, factor):
    if factor < 1:
        x = F.interpolate(x, align_corners=True, scale_factor=factor,
                          mode="bilinear")
        return factor * x
    x = factor * x
    return F.interpolate(x, align_corners=True, scale_factor=factor,
                         mode="bilinear")


class RefConvBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.main = nn.Conv2d(in_ch, out_ch, 3, stride, 1)
        self.activation = nn.LeakyReLU(0.2)

    def forward(self, x):
        return self.activation(self.main(x))


class RefUnet(nn.Module):
    def __init__(self, enc_nf, dec_nf):
        super().__init__()
        self.enc_nf, self.dec_nf = enc_nf, dec_nf
        prev = 2
        self.downarm = nn.ModuleList()
        for nf in enc_nf:
            self.downarm.append(RefConvBlock(prev, nf, stride=2))
            prev = nf
        enc_hist = list(reversed(enc_nf))
        self.uparm = nn.ModuleList()
        for i, nf in enumerate(dec_nf[: len(enc_nf)]):
            ch = prev + enc_hist[i] if i > 0 else prev
            self.uparm.append(RefConvBlock(ch, nf))
            prev = nf
        prev += 2
        self.extras = nn.ModuleList()
        for nf in dec_nf[len(enc_nf):]:
            self.extras.append(RefConvBlock(prev, nf))
            prev = nf

    def forward(self, x):
        xs = [x]
        for layer in self.downarm:
            xs.append(layer(xs[-1]))
        h = xs.pop()
        for layer in self.uparm:
            h = layer(h)
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = torch.cat([h, xs.pop()], dim=1)
        for layer in self.extras:
            h = layer(h)
        return h


class RefVxmDense(nn.Module):
    """state_dict keys match the reference's netR ('unet_model...', 'flow...')."""

    def __init__(self, inshape, nb_features, int_steps=7, int_downsize=2,
                 bidir=True):
        super().__init__()
        enc_nf, dec_nf = nb_features
        self.unet_model = RefUnet(enc_nf, dec_nf)
        self.flow = nn.Conv2d(dec_nf[-1], len(inshape), 3, padding=1)
        with torch.no_grad():
            self.flow.weight.normal_(0, 1e-5)
            self.flow.bias.zero_()
        self.int_steps = int_steps
        self.int_downsize = int_downsize
        self.bidir = bidir
        down_shape = [s // int_downsize for s in inshape]
        self.integrate = RefVecInt(down_shape, int_steps)
        self.transformer = RefSTN(inshape)

    def forward(self, source, target, registration=False):
        x = torch.cat([source, target], dim=1)
        x = self.unet_model(x)
        flow_field = self.flow(x)
        pos_flow = _resize_flow_torch(flow_field, 1.0 / self.int_downsize)
        preint = pos_flow
        neg_flow = -pos_flow if self.bidir else None
        pos_flow = self.integrate(pos_flow)
        neg_flow = self.integrate(neg_flow) if self.bidir else None
        pos_flow = _resize_flow_torch(pos_flow, float(self.int_downsize))
        neg_flow = (_resize_flow_torch(neg_flow, float(self.int_downsize))
                    if self.bidir else None)
        y_source = self.transformer(source, pos_flow)
        y_target = self.transformer(target, neg_flow) if self.bidir else None
        if not registration:
            return ((y_source, y_target, pos_flow) if self.bidir
                    else (y_source, preint))
        return y_source, pos_flow


class RefPatchSampleF(nn.Module):
    """state_dict keys match the reference's netF ('mlp_<i>.<0|2>...')."""

    def __init__(self, feature_dims, nc=256):
        super().__init__()
        for i, d in enumerate(feature_dims):
            setattr(self, f"mlp_{i}", nn.Sequential(
                nn.Linear(d, nc), nn.ReLU(), nn.Linear(nc, nc)))

    def forward(self, feats, num_patches=256, patch_ids=None):
        out_feats, out_ids = [], []
        for i, feat in enumerate(feats):
            B, C = feat.shape[0], feat.shape[1]
            flat = feat.permute(0, 2, 3, 1).flatten(1, 2)
            if patch_ids is not None:
                pid = patch_ids[i]
            else:
                pid = torch.randperm(flat.shape[1])[:num_patches]
            x = flat[:, pid, :].flatten(0, 1)
            x = getattr(self, f"mlp_{i}")(x)
            norm = x.pow(2).sum(1, keepdim=True).pow(0.5)
            x = x.div(norm + 1e-7)
            out_feats.append(x)
            out_ids.append(pid)
        return out_feats, out_ids


# ------------------------------------------------------------ unet netG

class RefUnetSkipBlock(nn.Module):
    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False, use_dropout=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = nn.Conv2d(input_nc, inner_nc, 4, stride=2, padding=1,
                             bias=True)
        if outermost:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downconv] + [submodule] + [
                nn.ReLU(True), upconv, nn.Tanh()]
        elif innermost:
            upconv = nn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1,
                                        bias=True)
            model = [nn.LeakyReLU(0.2, True), downconv,
                     nn.ReLU(True), upconv, nn.InstanceNorm2d(outer_nc)]
        else:
            upconv = nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                        bias=True)
            model = [nn.LeakyReLU(0.2, True), downconv,
                     nn.InstanceNorm2d(inner_nc)] + [submodule] + [
                nn.ReLU(True), upconv, nn.InstanceNorm2d(outer_nc)]
            if use_dropout:
                model += [nn.Dropout(0.5)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class RefUnetGenerator(nn.Module):
    def __init__(self, input_nc=1, output_nc=1, num_downs=8, ngf=64,
                 use_dropout=False):
        super().__init__()
        block = RefUnetSkipBlock(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = RefUnetSkipBlock(ngf * 8, ngf * 8, submodule=block,
                                     use_dropout=use_dropout)
        block = RefUnetSkipBlock(ngf * 4, ngf * 8, submodule=block)
        block = RefUnetSkipBlock(ngf * 2, ngf * 4, submodule=block)
        block = RefUnetSkipBlock(ngf, ngf * 2, submodule=block)
        self.model = RefUnetSkipBlock(output_nc, ngf, input_nc=input_nc,
                                      submodule=block, outermost=True)

    def forward(self, x):
        return self.model(x)


# -------------------------------------------------------- discriminators

class RefNLayerDiscriminator(nn.Module):
    def __init__(self, input_nc=1, ndf=64, n_layers=3, no_antialias=False):
        super().__init__()
        kw, padw = 4, 1
        if no_antialias:
            seq = [nn.Conv2d(input_nc, ndf, kw, 2, padw),
                   nn.LeakyReLU(0.2, True)]
        else:
            seq = [nn.Conv2d(input_nc, ndf, kw, 1, padw),
                   nn.LeakyReLU(0.2, True), BlurDown(ndf)]
        mult = 1
        for n in range(1, n_layers):
            mult_prev, mult = mult, min(2 ** n, 8)
            if no_antialias:
                seq += [nn.Conv2d(ndf * mult_prev, ndf * mult, kw, 2, padw,
                                  bias=True),
                        nn.InstanceNorm2d(ndf * mult),
                        nn.LeakyReLU(0.2, True)]
            else:
                seq += [nn.Conv2d(ndf * mult_prev, ndf * mult, kw, 1, padw,
                                  bias=True),
                        nn.InstanceNorm2d(ndf * mult),
                        nn.LeakyReLU(0.2, True), BlurDown(ndf * mult)]
        mult_prev, mult = mult, min(2 ** n_layers, 8)
        seq += [nn.Conv2d(ndf * mult_prev, ndf * mult, kw, 1, padw,
                          bias=True),
                nn.InstanceNorm2d(ndf * mult), nn.LeakyReLU(0.2, True),
                nn.Conv2d(ndf * mult, 1, kw, 1, padw)]
        self.model = nn.Sequential(*seq)

    def forward(self, x):
        return self.model(x)
