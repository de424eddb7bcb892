"""Reference-checkpoint import: torch state_dict -> RefUNet -> samplers.

The migration path for users arriving with the reference's trained
``ddpm_epochN.pt`` / ``ema_epochN.pt`` artifacts (which the reference
itself never loads — SURVEY.md §5.4). Parity is pinned against a real
torch module with the reference's exact state_dict key layout
(``src/models/unet.py:18-65``), the same oracle style as
``tests/test_models.py``.
"""

import math
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from superdiff_tpu.compat import (import_checkpoint, infer_ref_arch,
                                  ref_params_from_state_dict)
from superdiff_tpu.compat.torch_import import normalize_state_dict
from superdiff_tpu.models.unet_ref import RefUNet


def _torch_ref_unet(base_channels=8, time_emb_dim=256):
    """An independent torch build of the reference UNet graph, with the
    reference's state_dict key layout (downs.N.block.M / mid / ups.N /
    time_mlp.{1,3})."""
    import torch.nn as nn

    def block(in_ch, out_ch):
        m = nn.Module()
        m.block = nn.Sequential(
            nn.GroupNorm(min(4, in_ch), in_ch), nn.SiLU(),
            nn.Conv2d(in_ch, out_ch, 3, padding=1),
            nn.GroupNorm(min(4, out_ch), out_ch), nn.SiLU(),
            nn.Conv2d(out_ch, out_ch, 3, padding=1))
        m.time_emb = nn.Linear(time_emb_dim, out_ch)
        return m

    net = nn.Module()
    # index 0 is the (param-less) sinusoidal embed slot, keeping the
    # Linear layers at state_dict keys time_mlp.1 / time_mlp.3
    net.time_mlp = nn.Sequential(
        nn.Identity(), nn.Linear(time_emb_dim, time_emb_dim * 4),
        nn.SiLU(), nn.Linear(time_emb_dim * 4, time_emb_dim))
    bc = base_channels
    net.downs = nn.ModuleList([block(1, bc), block(bc, bc * 2)])
    net.mid = block(bc * 2, bc * 2)
    net.ups = nn.ModuleList([block(bc * 2, bc), block(bc, 1)])

    half = time_emb_dim // 2
    freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                      * -(math.log(10000.0) / (half - 1)))

    def forward(x, t):
        args = t.to(torch.float32)[:, None] * freqs[None, :]
        emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
        t_emb = net.time_mlp(emb)
        h = x
        for m in list(net.downs) + [net.mid] + list(net.ups):
            h = m.block(h) + m.time_emb(t_emb)[:, :, None, None]
        return h

    net.fwd = forward
    return net


def test_import_forward_parity():
    """Imported params must reproduce the torch forward at fp32."""
    torch.manual_seed(0)
    net = _torch_ref_unet(base_channels=8)
    sd = net.state_dict()

    arch = infer_ref_arch(normalize_state_dict(sd))
    assert arch == dict(time_emb_dim=256, base_channels=8,
                        in_channels=1, out_channels=1)

    params = ref_params_from_state_dict(sd)
    model = RefUNet(base_channels=8)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    t = np.asarray([3, 17], dtype=np.int64)

    with torch.no_grad():
        want = net.fwd(torch.tensor(x).permute(0, 3, 1, 2),
                       torch.tensor(t)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x),
                                 jnp.asarray(t, dtype=jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_import_cli_round_trip(tmp_path):
    """.pt -> import CLI -> load_run -> sample CLI, end to end."""
    from superdiff_tpu.cli.import_torch import main as import_main
    from superdiff_tpu.cli.sample import main as sample_main
    from superdiff_tpu.inference import load_run

    torch.manual_seed(2)
    net = _torch_ref_unet(base_channels=8)
    pt = os.path.join(str(tmp_path), "ema_epoch3.pt")
    torch.save(net.state_dict(), pt)

    out = os.path.join(str(tmp_path), "imported")
    rc = import_main(["--checkpoint", pt, "--out", out,
                      "--resolution", "16", "--num-timesteps", "20"])
    assert rc == 0

    cfg, model, schedule, ema = load_run(out)
    assert cfg.model.preset == "ref" and not cfg.model.conditional
    assert schedule.num_timesteps == 20
    assert isinstance(model, RefUNet) and model.base_channels == 8

    sdir = os.path.join(str(tmp_path), "samples")
    rc = sample_main(["--run-dir", out, "--method", "ddim",
                      "--num-steps", "4", "--batch-size", "2",
                      "--out", sdir])
    assert rc == 0
    x = np.load(os.path.join(sdir, "samples.npy"))
    assert x.shape == (2, 16, 16, 1) and np.isfinite(x).all()


def test_whole_ema_object_save_prefers_ema_weights():
    """ema-pytorch's default state_dict carries BOTH online_model.* and
    ema_model.* weight sets; the import must pick the EMA set (the
    deliverable the reference samples from), never let dict order decide."""
    torch.manual_seed(4)
    ema_net = _torch_ref_unet(base_channels=8)
    online_net = _torch_ref_unet(base_channels=8)  # different weights
    sd = {}
    # online first in insertion order — the buggy strip-both would keep
    # whichever iterates LAST, here ema; reverse order must not flip it
    for k, v in online_net.state_dict().items():
        sd[f"online_model.{k}"] = v
    for k, v in ema_net.state_dict().items():
        sd[f"ema_model.{k}"] = v
    sd["initted"] = torch.tensor(True)
    sd["step"] = torch.tensor(7)

    for order in (sd, dict(reversed(list(sd.items())))):
        norm = normalize_state_dict(order)
        want = ema_net.state_dict()["downs.0.block.2.weight"].numpy()
        np.testing.assert_array_equal(norm["downs.0.block.2.weight"], want)


def test_ref_preset_carries_parameterization():
    """build_model('ref') must keep the parameterization override — a
    v-distilled student of an imported reference run is rebuilt from its
    config snapshot, and dropping the field would silently read its v head
    as eps everywhere (samplers, losses, serving)."""
    from superdiff_tpu.config import Config
    from superdiff_tpu.inference import make_eps_fn_p
    from superdiff_tpu.models.presets import build_model, model_from_config

    m = build_model("ref", base_channels=8, parameterization="v")
    assert isinstance(m, RefUNet) and m.parameterization == "v"

    cfg = Config()
    cfg.model.preset = "ref"
    cfg.model.conditional = False
    cfg.model.base_channels = 8
    cfg.model.parameterization = "v"
    m2 = model_from_config(cfg)
    assert m2.parameterization == "v"
    # the eps adapter now demands the schedule it converts through
    with pytest.raises(ValueError, match="schedule"):
        make_eps_fn_p(m2)

    with pytest.raises(ValueError, match="parameterization"):
        build_model("ref", base_channels=8,
                    parameterization="nope").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
            jnp.zeros((1,), dtype=jnp.int32))


def test_import_rejects_garbage_and_strips_prefixes(tmp_path):
    # wrapper prefixes (DataParallel / whole-EMA-object saves) are stripped
    net = _torch_ref_unet(base_channels=8)
    wrapped = {f"ema_model.{k}": v for k, v in net.state_dict().items()}
    wrapped["initted"] = torch.tensor(True)
    wrapped["step"] = torch.tensor(100)
    params = ref_params_from_state_dict(wrapped)
    assert "time_mlp" in params["params"]

    # a non-reference state dict fails with a key-layout error, and a
    # non-dict .pt fails before any mapping
    with pytest.raises(ValueError, match="reference-UNet key"):
        ref_params_from_state_dict({"foo.weight": np.zeros((2, 2))})
    bad = os.path.join(str(tmp_path), "bad.pt")
    torch.save(torch.zeros(3), bad)
    with pytest.raises(ValueError, match="state_dict"):
        import_checkpoint(bad, os.path.join(str(tmp_path), "o"))


def test_trained_oracle_import_e2e(tmp_path):
    """VERDICT r3 #6 (miniature): train the torch oracle for real (its
    exact recipe, scripts/train_torch_oracle.py), then drive
    import -> sample -> evaluate -> superpose on the TRAINED weights and
    require finite FID + Itô logq. The full-size version is
    scripts/run_r4_torch_e2e.sh (artifacts/torch_import_e2e/)."""
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = os.path.join(repo, "scripts")
    root = os.path.join(str(tmp_path), "tree")
    res = 16

    env = dict(os.environ, PYTHONPATH=repo, SUPERDIFF_TPU_PLATFORM="cpu")
    subprocess.run(
        [_sys.executable, os.path.join(scripts, "make_synthetic_dataset.py"),
         "--root", root, "--resolution", str(res),
         "--train", "8", "--val", "2", "--test", "4"],
        check=True, env=env, capture_output=True)

    imports = {}
    for task in ("TB", "PNEUMONIA"):
        odir = os.path.join(str(tmp_path), f"oracle_{task}")
        r = subprocess.run(
            [_sys.executable, os.path.join(scripts, "train_torch_oracle.py"),
             "--root", root, "--task", task, "--resolution", str(res),
             "--base-channels", "8", "--steps", "100", "--batch", "4",
             "--num-timesteps", "50", "--out", odir],
            check=True, env=env, capture_output=True, text=True)
        # the recipe must actually learn: eps-MSE starts ~1.0 on unit
        # noise, so the trajectory must come down from the first printed
        # step loss (ADVICE r4: a substring check passed even on
        # divergence). Single-batch losses are noisy at this miniature
        # size, so compare first-printed vs final rather than an absolute
        # floor.
        losses = [float(x) for x in re.findall(
            r"loss ([0-9.]+)", r.stdout)]
        assert len(losses) >= 2, r.stdout[-500:]
        first, final = losses[0], losses[-1]
        assert np.isfinite(final), final
        assert final < min(1.0, 0.95 * first), (first, final)

        from superdiff_tpu.cli.import_torch import main as import_main
        imp = os.path.join(str(tmp_path), f"imported_{task}")
        rc = import_main(["--checkpoint", os.path.join(odir, "ema_epoch1.pt"),
                          "--out", imp, "--resolution", str(res),
                          "--num-timesteps", "50",
                          "--normalization", "tanh", "--task", task])
        assert rc == 0
        imports[task] = imp

    from superdiff_tpu.cli.evaluate import main as eval_main
    out = os.path.join(str(tmp_path), "eval.json")
    rc = eval_main(["--run-dir", imports["TB"],
                    "--run-dir2", imports["PNEUMONIA"],
                    "--dataset-root", root,
                    "--num-samples", "4", "--batch-size", "4",
                    "--method", "ddim", "--num-steps", "5",
                    "--extractor", "random", "--out", out])
    assert rc == 0
    with open(out) as f:
        res_json = json.load(f)
    assert np.isfinite(res_json["fid"])
    sd = res_json["superdiff"]
    assert np.isfinite(sd["logq_model1_mean"])
    assert np.isfinite(sd["logq_gap_mean"])
