#!/usr/bin/env python
"""Export torch `lpips` package VGG-16 weights to the wisp_tpu .npz schema.

Run on any machine with torch + torchvision + lpips installed (this environment has none,
so LPIPS is an explicit opt-in; reference wisp/ops/image/metrics.py:37-53 imports the torch
package directly):

    python tools/export_lpips_weights.py /path/out/lpips_vgg.npz
    export WISP_LPIPS_WEIGHTS=/path/out/lpips_vgg.npz

Schema consumed by wisp_tpu/ops/image/metrics.py::lpips:
    conv{i}_w [kh, kw, cin, cout] (HWIO)  i in 0..12   VGG-16 feature convs
    conv{i}_b [cout]
    lin{k}_w  [c_k]                       k in 0..4    LPIPS linear calibration (>=0)
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips as lpips_lib  # noqa: F401  (pulls torchvision VGG weights)

    model = lpips_lib.LPIPS(net="vgg")
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    out = {}
    conv_idx = 0
    # torchvision VGG16.features conv layer indices within the sequential stack
    vgg_conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for pos in vgg_conv_positions:
        w = state[f"net.slice{_slice_of(pos)}.{pos}.weight"]  # [cout, cin, kh, kw] OIHW
        b = state[f"net.slice{_slice_of(pos)}.{pos}.bias"]
        out[f"conv{conv_idx}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # HWIO
        out[f"conv{conv_idx}_b"] = b.astype(np.float32)
        conv_idx += 1
    for k in range(5):
        lin = state[f"lin{k}.model.1.weight"]  # [1, c, 1, 1]
        out[f"lin{k}_w"] = lin.reshape(-1).astype(np.float32)

    np.savez_compressed(out_path, **out)
    print(f"wrote {len(out)} arrays to {out_path}")
    _golden_self_test(out_path, model)


def _golden_self_test(npz_path: str, torch_model) -> None:
    """Print golden LPIPS values on deterministic images, from BOTH the exported-npz JAX
    network and the original torch model. The two columns must match (~1e-3); paste the
    values into tests/core/test_channels_and_metrics.py::TestLPIPS as the real-weight
    golden set (the in-repo goldens use synthetic weights because this export cannot run
    in the wisp_tpu CI environment)."""
    import os

    import torch

    os.environ["WISP_LPIPS_WEIGHTS"] = npz_path
    from wisp_tpu.ops.image import metrics as M
    M.reset_lpips_cache()

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
    grad = np.stack([xx, yy, 0.5 * (xx + yy)], -1)
    checker = (np.indices((64, 64)).sum(0) % 2).astype(np.float32)[..., None].repeat(3, -1)
    noise = np.asarray(np.random.default_rng(7).random((64, 64, 3)), np.float32)
    pairs = {"grad_vs_checker": (grad, checker), "grad_vs_noise": (grad, noise),
             "checker_vs_noise": (checker, noise),
             "grad_vs_gradshift": (grad, np.clip(grad + 0.1, 0, 1))}

    def to_torch(img):
        return torch.from_numpy(img * 2.0 - 1.0).permute(2, 0, 1)[None]

    print(f"{'pair':22s} {'jax(npz)':>10s} {'torch':>10s}")
    for name, (a, b) in pairs.items():
        jv = M.lpips(a, b)
        tv = float(torch_model(to_torch(a), to_torch(b)).item())
        print(f"{name:22s} {jv:10.6f} {tv:10.6f}")


def _slice_of(pos: int) -> int:
    # lpips VGG wrapper splits torchvision's features into slice1..slice5 at the tap points
    if pos <= 3:
        return 1
    if pos <= 8:
        return 2
    if pos <= 15:
        return 3
    if pos <= 22:
        return 4
    return 5


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    main(sys.argv[1])
