"""Shared torch-primitive oracle helpers for the golden tests.

Each helper applies a torch primitive with flax-layout weights
transposed into torch layout (the weights_io convention: conv
HWIO->OIHW / DHWIO->OIDHW, dense in,out -> out,in). Composed oracles
(resblocks, transformers, the full UNet assembly) live in the test
files; these are the shared leaves.
"""

import numpy as np
import torch


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def conv2d(x, kern, bias, padding=1, stride=1):
    w = t(np.transpose(np.asarray(kern), (3, 2, 0, 1)))
    return torch.nn.functional.conv2d(x, w, t(bias), stride=stride,
                                      padding=padding)


def conv3d(x, kern, bias, padding):
    w = t(np.transpose(np.asarray(kern), (4, 3, 0, 1, 2)))
    return torch.nn.functional.conv3d(x, w, t(bias), padding=padding)


def linear(x, kern, bias=None):
    w = t(np.asarray(kern).T)
    return torch.nn.functional.linear(
        x, w, None if bias is None else t(bias))


def gn(x, scale, bias, groups, eps):
    return torch.nn.functional.group_norm(x, groups, t(scale), t(bias),
                                          eps)


def ln(x, scale, bias):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), t(scale),
                                          t(bias), eps=1e-6)


silu = torch.nn.functional.silu


def attention(x, ctx, p, pre, heads):
    q = linear(x, p[f"{pre}/to_q/kernel"])
    k = linear(ctx, p[f"{pre}/to_k/kernel"])
    v = linear(ctx, p[f"{pre}/to_v/kernel"])

    def split(z):
        b, l, d = z.shape
        return z.reshape(b, l, heads, d // heads).permute(0, 2, 1, 3)

    o = torch.nn.functional.scaled_dot_product_attention(
        split(q), split(k), split(v))
    b, h, l, dh = o.shape
    o = o.permute(0, 2, 1, 3).reshape(b, l, h * dh)
    return linear(o, p[f"{pre}/to_out_0/kernel"],
                  p[f"{pre}/to_out_0/bias"])


def geglu(x, p, pre):
    h = linear(x, p[f"{pre}/net_0_proj/kernel"],
               p[f"{pre}/net_0_proj/bias"])
    a, gate = h.chunk(2, dim=-1)
    h = a * torch.nn.functional.gelu(gate)
    return linear(h, p[f"{pre}/net_2/kernel"], p[f"{pre}/net_2/bias"])
