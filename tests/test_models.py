"""Model parity tests.

A minimal torch twin of each reference architecture is constructed here in
the test (from the architecture spec, independent of the reference source);
its random state_dict is imported through models.torch_import and the flax
forward must match the torch forward. This validates both the architecture
and the checkpoint importer against real reference checkpoints' layout.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from efficient_nerf_tpu.models import (NeRFMLP, R2LNet, nerf_flops_per_pixel,
                                       r2l_flops_per_pixel)
from efficient_nerf_tpu.models.torch_import import (
    nerf_params_from_state_dict, r2l_params_from_state_dict,
    r2l_state_dict_from_params)


class TorchNeRF(tnn.Module):
    """Spec twin of the reference teacher MLP (state_dict-compatible)."""

    def __init__(self, D=8, W=256, input_ch=63, input_ch_views=27,
                 output_ch=4, skips=(4,), use_viewdirs=True):
        super().__init__()
        self.D, self.W = D, W
        self.input_ch, self.input_ch_views = input_ch, input_ch_views
        self.skips, self.use_viewdirs = skips, use_viewdirs
        layers = [tnn.Linear(input_ch, W)]
        for i in range(D - 1):
            d_in = W + input_ch if i in skips else W
            layers.append(tnn.Linear(d_in, W))
        self.pts_linears = tnn.ModuleList(layers)
        if use_viewdirs:
            self.views_linears = tnn.ModuleList([tnn.Linear(input_ch_views + W, W // 2)])
            self.feature_linear = tnn.Linear(W, W)
            self.alpha_linear = tnn.Linear(W, 1)
            self.rgb_linear = tnn.Linear(W // 2, 3)
        else:
            self.output_linear = tnn.Linear(W, output_ch)

    def forward(self, x):
        pts, views = torch.split(x, [self.input_ch, self.input_ch_views], -1)
        h = pts
        for i, layer in enumerate(self.pts_linears):
            h = torch.relu(layer(h))
            if i in self.skips:
                h = torch.cat([pts, h], -1)
        if self.use_viewdirs:
            alpha = self.alpha_linear(h)
            h = torch.cat([self.feature_linear(h), views], -1)
            for layer in self.views_linears:
                h = torch.relu(layer(h))
            return torch.cat([self.rgb_linear(h), alpha], -1)
        return self.output_linear(h)


class Block(tnn.Module):
    def __init__(self, width, n_learnable, res_scale):
        super().__init__()
        mods = [tnn.Linear(width, width)]
        for _ in range(n_learnable - 1):
            mods += [tnn.ReLU(), tnn.Linear(width, width)]
        self.body = tnn.Sequential(*mods)
        self.res_scale = res_scale

    def forward(self, x):
        return self.body(x) * self.res_scale + x


class TorchR2L(tnn.Module):
    """Spec twin of the reference R2L resmlp student."""

    def __init__(self, input_dim, D, W, n_block, n_learnable=2,
                 use_residual=False, linear_tail=False, res_scale=1.0):
        super().__init__()
        self.use_residual, self.res_scale = use_residual, res_scale
        self.head = tnn.Sequential(tnn.Linear(input_dim, W), tnn.ReLU())
        self.body = tnn.Sequential(
            *[Block(W, n_learnable, res_scale) for _ in range(n_block)])
        self.tail = (tnn.Linear(W, 3) if linear_tail
                     else tnn.Sequential(tnn.Linear(W, 3), tnn.Sigmoid()))

    def forward(self, x):
        x = self.head(x)
        x = self.body(x) + x if self.use_residual else self.body(x)
        return self.tail(x)


@pytest.mark.parametrize("use_viewdirs", [True, False])
def test_nerf_teacher_parity(use_viewdirs, rng):
    D, W, ic, icv = 4, 32, 63, 27
    torch.manual_seed(0)
    tm = TorchNeRF(D=D, W=W, input_ch=ic, input_ch_views=icv, skips=(2,),
                   use_viewdirs=use_viewdirs)
    tm.eval()
    x = rng.normal(size=(17, ic + icv)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params = nerf_params_from_state_dict(tm.state_dict(), depth=D,
                                         use_viewdirs=use_viewdirs)
    model = NeRFMLP(depth=D, width=W, input_ch=ic, input_ch_views=icv,
                    skips=(2,), use_viewdirs=use_viewdirs)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("use_residual,linear_tail,res_scale",
                         [(False, False, 1.0), (True, True, 0.5)])
def test_r2l_parity(use_residual, linear_tail, res_scale, rng):
    input_dim, D, W = 6 * 5, 8, 16
    n_block = (D - 2) // 2
    torch.manual_seed(0)
    tm = TorchR2L(input_dim, D, W, n_block, use_residual=use_residual,
                  linear_tail=linear_tail, res_scale=res_scale)
    tm.eval()
    x = rng.normal(size=(9, input_dim)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params = r2l_params_from_state_dict(tm.state_dict(), n_block=n_block,
                                        linear_tail=linear_tail)
    model = R2LNet(input_dim=input_dim, depth=D, width=W,
                   use_residual=use_residual, linear_tail=linear_tail,
                   res_scale=res_scale)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # round-trip export matches the torch layout
    sd = r2l_state_dict_from_params(params, linear_tail=linear_tail)
    for k, v in sd.items():
        np.testing.assert_allclose(v, tm.state_dict()[k].numpy(), atol=1e-7)


def test_r2l_init_and_shapes():
    model = R2LNet(input_dim=1008, depth=8, width=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 1008)))
    out = model.apply(params, jnp.zeros((2, 1008)))
    assert out.shape == (2, 3)
    # scan body: stacked leaves [n_block, ...]
    assert params["params"]["body"]["lin_0"]["kernel"].shape == (3, 16, 16)


def test_r2l_remat_matches():
    model_a = R2LNet(input_dim=24, depth=8, width=16, remat_body=False)
    model_b = R2LNet(input_dim=24, depth=8, width=16, remat_body=True)
    params = model_a.init(jax.random.PRNGKey(1), jnp.zeros((2, 24)))
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 24))
    np.testing.assert_allclose(np.asarray(model_a.apply(params, x)),
                               np.asarray(model_b.apply(params, x)), atol=1e-6)


def test_flops_match_paper_table2():
    # R2L W256 D88, 16 samples x 3 coords x 21 embed dims = 1008 input
    assert abs(r2l_flops_per_pixel(1008, 88, 256) / 1e6 - 11.79) < 0.05
    # Teacher NeRF: 303.82 MFLOPs/pixel at 64 + 64 + 128 evals
    assert abs(nerf_flops_per_pixel() / 1e6 - 303.82) < 0.5


def test_r2l_conv_net_shapes_and_bn(rng):
    """R2LConvNet: NHWC patch forward for both body archs, BN collections,
    output in (0,1) from the sigmoid tail."""
    from efficient_nerf_tpu.models import R2LConvNet

    C = 4 * 3 * 21
    x = jnp.asarray(rng.normal(size=(2, 8, 8, C)).astype(np.float32))
    for arch in ("conv", "resblock"):
        m = R2LConvNet(input_dim=C, depth=6, width=16, body_arch=arch,
                       kernel_size=3, use_bn=False)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        y = m.apply({"params": p}, x)
        assert y.shape == (2, 8, 8, 3)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    m = R2LConvNet(input_dim=C, depth=4, width=16, use_bn=True)
    v = m.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in v
    y, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 8, 8, 3) and "batch_stats" in upd
    # eval mode consumes running stats without mutation
    y2 = m.apply(v, x, train=False)
    assert np.isfinite(np.asarray(y2)).all()
