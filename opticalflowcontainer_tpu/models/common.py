"""Shared building blocks for the model zoo.

torch-parity notes (these matter for converted checkpoints):

- torch ``Conv2d(k=3, padding=1, stride=2)`` pads (1, 1) explicitly; XLA
  ``SAME`` pads (0, 1) for even inputs — an off-by-one spatial shift.  So
  :func:`conv` always uses explicit symmetric padding, never ``SAME``.
- torch ``ConvTranspose2d(k=4, s=2, p=1)`` == input-dilated conv with the
  kernel spatially flipped and in/out swapped; :func:`deconv` implements that
  exactly (verified against torch in tests/test_models_common.py).

Layout: NHWC activations, HWIO kernels.  Weight converters transpose torch's
OIHW -> HWIO (and ConvTranspose's IOHW -> flipped HWIO).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def leaky(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=slope)


class Conv(nn.Module):
    """Conv2d with torch-style explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.padding if self.padding is not None else (self.kernel // 2) * self.dilation
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
        )(x)


class Deconv(nn.Module):
    """torch ``ConvTranspose2d(kernel=4, stride=2, padding=1)`` equivalent:
    2x upsampling transposed conv (optionally grouped/depthwise)."""

    features: int
    kernel: int = 4
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, k, cin // self.groups, self.features),
            x.dtype,
        )
        unbatched = x.ndim == 3
        if unbatched:
            x = x[None]
        pad = k - 1 - 1  # transpose of padding=1
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), x.dtype)
            out = out + bias
        return out[0] if unbatched else out


def convert_torch_conv(w, b=None):
    """OIHW torch conv weight -> HWIO kernel (+ bias unchanged)."""
    import numpy as np

    k = np.transpose(np.asarray(w), (2, 3, 1, 0))
    return (k, None if b is None else np.asarray(b))


def convert_torch_deconv(w, b=None, groups: int = 1):
    """torch ConvTranspose2d weight [Cin, Cout/groups, kH, kW] -> the flipped
    HWIO kernel :class:`Deconv` expects ([kH, kW, Cin/groups, Cout])."""
    import numpy as np

    w = np.asarray(w)[:, :, ::-1, ::-1]  # spatial flip
    cin, cog, kh, kw = w.shape
    if groups == 1:
        k = np.transpose(w, (2, 3, 0, 1))  # [kH,kW,Cin,Cout]
    else:
        # grouped: torch [Cin, Cout/g, kh, kw] with Cin = g * (Cin/g)
        cpg = cin // groups
        w = w.reshape(groups, cpg, cog, kh, kw)
        k = np.transpose(w, (3, 4, 1, 0, 2)).reshape(kh, kw, cpg, groups * cog)
    return (k, None if b is None else np.asarray(b))


def fuse_conv_bn(kernel, bias, gamma, beta, mean, var, eps: float = 1e-5):
    """Fold BatchNorm into the preceding conv (the NeuFlow node's Conv+BN
    fusion optimization, reference neuflow_node.py:41-47, 68-92).

    kernel HWIO; returns (kernel', bias')."""
    import numpy as np

    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    k = np.asarray(kernel) * scale[None, None, None, :]
    b = (np.asarray(bias) if bias is not None else 0.0) - np.asarray(mean)
    b = b * scale + np.asarray(beta)
    return k, b


def cast_params(params, dtype):
    """Cast a param tree for reduced-precision serving (the reference's
    NeuFlow node runs fp16 — reference neuflow_node.py:50; on TPU the analogue
    is bfloat16: half the HBM traffic, MXU-native).  Feed bf16 inputs too;
    flax ops follow operand dtypes."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda x: x.astype(dtype), params)


def load_flat_npz(path: str) -> dict:
    """Flax params from a flat-npz checkpoint ('a/b/c' keys, the
    tools/train_flow.py save format) — the single shared loader behind the
    packaged-weight helpers and eval's --ckpt candidate path."""
    import numpy as np
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    tree = unflatten_dict({tuple(k.split("/")): data[k] for k in data.files})
    return {"params": tree}
